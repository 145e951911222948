#!/usr/bin/env python
"""Hold-out adversarial training driver: 60/20/20 partition, model_ad with
heads=8 (reference: train_adversarial.py)."""

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.train.kfold import run_holdout

if __name__ == "__main__":
    opt = Option().parse()
    run_holdout(opt)

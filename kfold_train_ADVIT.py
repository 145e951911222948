#!/usr/bin/env python
"""K-fold ADVIT baseline driver: volumes padded to (128, 128, 79), Adam 1e-4
without a scheduler, 40 epochs (reference: kfold_train_ADVIT.py)."""

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.train.kfold import run_kfold

if __name__ == "__main__":
    opt = Option().parse()
    run_kfold(opt, variant="advit")

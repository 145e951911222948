#!/usr/bin/env python
"""K-fold single-modality (MRI-only sNet) driver
(reference: kfold_train_single.py)."""

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.train.kfold import run_kfold

if __name__ == "__main__":
    opt = Option().parse()
    run_kfold(opt, variant="single")

#!/usr/bin/env python
"""K-fold MiSePyNet/Mnet baseline driver: volumes padded to (91, 109, 91),
SGD 1e-3 momentum 0.9 with MultiStep[6, 21], 40 epochs
(reference: kfold_train_Mnet.py)."""

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.train.kfold import run_kfold

if __name__ == "__main__":
    opt = Option().parse()
    run_kfold(opt, variant="mnet")

#!/usr/bin/env python
"""K-fold adversarial training driver (the README's main entry point).

Usage matches the reference (reference: README.md:45):
  python kfold_train_adversarial.py --randint False --aug True --batch_size 8 \
      --name <exp> --task <ADCN|pMCIsMCI> --model <CNN|Transformer> \
      --dataroot <dir>
"""

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.train.kfold import run_kfold

if __name__ == "__main__":
    opt = Option().parse()
    run_kfold(opt, variant="adversarial")

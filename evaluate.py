#!/usr/bin/env python
"""Standalone evaluation: run test metrics from a saved checkpoint.

Extends the reference surface (which can only evaluate inside a training
run, reference: kfold_train_adversarial.py:229-250):

  python evaluate.py --name EXP --task ADCN --model Transformer \
      --dataroot /data/ADNI --checkpoint checkpoints/EXP/0/best_label_*.msgpack
"""

import argparse
import glob
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # honor an explicit CPU request: the TPU plugin rewrites the env var to
    # "axon,cpu", and with the TPU tunnel down the axon client hangs at
    # first device use (CLAUDE.md "Environment gotchas")
    jax.config.update("jax_platforms", "cpu")

from transmf_ad_tpu.config import Option
from transmf_ad_tpu.data.adni import ADNI
from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig
from transmf_ad_tpu.utils.logging import Logger


def main():
    # reuse the training flag surface plus --checkpoint
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint", type=str, required=True)
    ns, rest = extra.parse_known_args()
    sys.argv = [sys.argv[0]] + rest
    opt = Option().parse()

    records = ADNI(opt.dataroot, "ADNI.csv", opt.task).data_dict
    source = VolumeSource(records)
    loader = Loader(source, batch_size=opt.batch_size)

    paths = sorted(glob.glob(ns.checkpoint))
    if not paths:
        raise SystemExit(f"no checkpoint matches {ns.checkpoint}")

    model = {"Transformer": "ad", "CNN": "cnn_ad"}.get(opt.model, opt.model)
    cfg = TrainerConfig(
        model=model, dim=opt.dim, depth=opt.trans_enc_depth, heads=opt.heads,
        dropout=opt.dropout, save_dir=f"{opt.checkpoints_dir}/{opt.name}",
        use_pallas=opt.use_pallas_opt, dtype=opt.dtype or "auto",
    )
    trainer = Trainer(cfg, Logger(cfg.save_dir))
    # public scoring entry: restores a framework .msgpack OR a reference
    # torch .pt (mapped via utils/torch_import.py), so reference-trained
    # models evaluate here directly
    m = trainer.evaluate_from_checkpoint(loader, paths[-1])
    print(
        f"loss: {m['loss']:.4f} accuracy: {m['accuracy']:.4f} "
        f"sensitivity: {m['sen']:.4f} specificity: {m['spe']:.4f} "
        f"f1 score: {m['f1']:.4f} AUC: {m['auc']:.4f}"
    )


if __name__ == "__main__":
    main()

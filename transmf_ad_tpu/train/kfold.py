"""K-fold and hold-out experiment drivers.

Reproduces the reference driver topology (reference:
kfold_train_adversarial.py:23-274 and siblings): task-pinned seeds
(ADCN -> 42, pMCIsMCI -> 996, default 1, --randint True -> random 1..1000),
sklearn KFold(5, shuffle) over the ADNI index, a further 80/20
train/val split of each fold's training indices, per-fold training with
best-val-accuracy checkpointing, test evaluation with the best weights, and
a final mean +- std aggregation of [loss, acc, sen, spe, f1, auc].

Driver variants (one per reference entry point):
 - 'adversarial': model_ad / model_CNN_ad, triple loss, drop_last train
   loader                      (reference: kfold_train_adversarial.py)
 - 'single':      model_single, MRI only, no drop_last
                               (reference: kfold_train_single.py:64,74-76)
 - 'advit':       ADVIT, volumes padded to (128,128,79), Adam 1e-4 with no
   scheduler, 40 epochs, never augments
                               (reference: kfold_train_ADVIT.py:63,84-85,225)
 - 'mnet':        Mnet, padded to (91,109,91), SGD 1e-3 momentum .9,
   MultiStep[6,21], 40 epochs  (reference: kfold_train_Mnet.py:64,85-86,226)

Unlike the reference (which re-decodes every NIfTI from disk each epoch),
one RAM-cached VolumeSource is shared across folds.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np
from sklearn.model_selection import KFold, train_test_split

from ..config import Options, str2bool
from ..data.adni import ADNI
from ..data.pipeline import Loader, VolumeSource
from ..utils.logging import Logger
from .trainer import Trainer, TrainerConfig, resolve_dtype

METRIC_NAMES = ("loss", "acc", "sen", "spe", "f1", "auc")


def transfer_dtype(opt: Options):
    """Host cache/transfer dtype for volumes: the compute dtype when it is
    bfloat16 (halves H2D bytes and RAM cache vs float32 — the host feed is
    the epoch bottleneck once device steps are ~60 ms), float32 otherwise.
    `--feed_dtype uint8` quantizes the normalized volume instead (1/4 the
    float32 bytes; device-side dequant — see VolumeSource).
    Exact-MONAI augmentation forces float32 (the exact pipeline is defined
    on the float32 normalized volume; a bf16/uint8 cache round-trip would
    break bit-near-exactness, data/exact_monai.py)."""
    if str2bool(opt.aug_exact) and opt.aug_bool:
        return np.float32
    if getattr(opt, "feed_dtype", "auto") not in ("auto", "", None):
        return np.dtype(opt.feed_dtype) if opt.feed_dtype != "bfloat16" \
            else np.dtype(resolve_dtype("bfloat16"))
    dt = resolve_dtype(opt.dtype or "auto")
    return np.dtype(dt) if dt is not None else np.float32


def dataset_weights(records) -> "np.ndarray":
    """Inverse-frequency class weights [1/n_neg, 1/n_pos]
    (reference: utils/utils.py:70-82; computed per fold, applied only when
    --use_class_weights True — the reference computes but never applies)."""
    import numpy as _np

    labels = [r["label"] for r in records]
    n0, n1 = max(labels.count(0), 1), max(labels.count(1), 1)
    print(f"negative class has {labels.count(0)} samples")
    print(f"positive class has {labels.count(1)} samples")
    return _np.array([1.0 / n0, 1.0 / n1], _np.float32)


def task_seed(opt: Options) -> int:
    seed = 1
    if opt.task == "ADCN":
        seed = 42
    elif opt.task == "pMCIsMCI":
        seed = 996
    if opt.randint == "True":
        seed = random.randint(1, 1000)
    return seed


def _variant_spec(variant: str, opt: Options) -> Dict:
    if variant == "adversarial":
        model = {"Transformer": "ad", "CNN": "cnn_ad"}[opt.model]
        return dict(model=model, pad_to=None, drop_last=True,
                    optimizer=opt.optimizer, lr=opt.lr, momentum=0.0,
                    milestones=None, epochs=opt.epochs, aug=opt.aug_bool,
                    modalities=("MRI", "PET"))
    if variant == "single":
        return dict(model="single", pad_to=None, drop_last=False,
                    optimizer=opt.optimizer, lr=opt.lr, momentum=0.0,
                    milestones=None, epochs=opt.epochs, aug=opt.aug_bool,
                    modalities=("MRI",))
    # ADVIT/Mnet reference drivers hard-code 40 epochs
    # (kfold_train_ADVIT.py:225, kfold_train_Mnet.py:226) — equal to the
    # default stage1+stage2 sum, so opt.epochs preserves that default
    # while staying overridable.
    if variant == "advit":
        return dict(model="advit", pad_to=(128, 128, 79), drop_last=True,
                    optimizer="Adam", lr=1e-4, momentum=0.0, milestones=(),
                    epochs=opt.epochs, aug=False, modalities=("MRI", "PET"))
    if variant == "mnet":
        return dict(model="mnet", pad_to=(91, 109, 91), drop_last=True,
                    optimizer="SGD", lr=1e-3, momentum=0.9, milestones=(6, 21),
                    epochs=opt.epochs, aug=opt.aug_bool,
                    modalities=("MRI", "PET"))
    raise ValueError(f"unknown variant {variant!r}")


def _make_trainer_cfg(opt: Options, spec: Dict, fold_dir: str,
                      seed: int) -> TrainerConfig:
    return TrainerConfig(
        model=spec["model"],
        dim=opt.dim,
        depth=opt.trans_enc_depth,
        heads=opt.heads,
        dropout=opt.dropout,
        optimizer=spec["optimizer"],
        lr=spec["lr"],
        weight_decay=opt.weight_decay,
        momentum=spec["momentum"],
        milestones=spec["milestones"],
        epochs=spec["epochs"],
        aug=spec["aug"],
        aug_exact=str2bool(opt.aug_exact),
        seed=seed,
        save_dir=fold_dir,
        use_pallas=opt.use_pallas_opt,
        dtype=opt.dtype or "auto",
        resume=opt.resume == "True",
        pretrained_path=opt.pretrained,
        remat=opt.remat == "True",
        debug_nans=opt.debug_nans == "True",
        coordinator_address=opt.coordinator_address or None,
        num_processes=opt.num_processes or None,
        process_id=opt.process_id if opt.process_id >= 0 else None,
    )


def _init_multihost(opt: Options) -> bool:
    """Join the distributed runtime (no-op single-process) BEFORE any
    logger/file side effect, and report whether this process owns them."""
    from ..parallel import init_distributed, is_primary

    init_distributed(opt.coordinator_address or None,
                     opt.num_processes or None,
                     opt.process_id if opt.process_id >= 0 else None)
    return is_primary()


def run_kfold(opt: Options, variant: str = "adversarial",
              pad_to_override=None) -> Dict[str, List[float]]:
    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    primary = _init_multihost(opt)
    from ..parallel import NullLogger

    logger_main = Logger(save_dir) if primary else NullLogger()
    spec = _variant_spec(variant, opt)
    if pad_to_override is not None:
        spec["pad_to"] = pad_to_override

    data = ADNI(opt.dataroot, "ADNI.csv", opt.task).data_dict
    extra: List = []
    if opt.task == "pMCIsMCI" and opt.extra_sample == "True":
        extra = ADNI(opt.dataroot, "ADNI.csv", "ADCN").data_dict

    source = VolumeSource(data + extra, keys=spec["modalities"],
                          pad_to=spec["pad_to"], dtype=transfer_dtype(opt))
    extra_idx = list(range(len(data), len(data) + len(extra)))

    seed = task_seed(opt)
    print(f"The random seed is {seed}")
    kf = KFold(n_splits=opt.num_folds, shuffle=True, random_state=seed)

    fold_subset = (None if not opt.folds else
                   {int(f) for f in str(opt.folds).split(",") if f != ""})
    results = []
    for fold, (train_idx, test_idx) in enumerate(kf.split(np.arange(len(data)))):
        if fold_subset is not None and fold not in fold_subset:
            continue  # same split layout; this host only trains its folds
        logger_main.print_message(f"************Fold {fold}************")
        train_idx, val_idx = train_test_split(train_idx, test_size=0.2,
                                              random_state=seed)
        train_indices = list(train_idx) + extra_idx
        train_loader = Loader(source, train_indices, opt.batch_size,
                              shuffle=True, drop_last=spec["drop_last"],
                              seed=seed + fold, prefetch=opt.prefetch)
        val_loader = Loader(source, list(val_idx), opt.batch_size)
        test_loader = Loader(source, list(test_idx), opt.batch_size)
        print(f"Train Datasets: {len(train_indices)}")
        print(f"Val Datasets: {len(val_idx)}")
        print(f"Test Datasets: {len(test_idx)}")

        weights = dataset_weights([source.records[i] for i in train_indices])
        class_weights = weights if opt.use_class_weights == "True" else None

        fold_dir = os.path.join(save_dir, str(fold))
        cfg = _make_trainer_cfg(opt, spec, fold_dir, seed)
        trainer = Trainer(cfg, Logger(fold_dir) if primary else None)
        res_fold = trainer.fit(train_loader, val_loader, test_loader,
                               class_weights=class_weights)
        logger_main.print_message_nocli(
            f"loss: {res_fold[0]:.4f} accuracy: {res_fold[1]:.4f} "
            f"sensitivity: {res_fold[2]:.4f} specificity: {res_fold[3]:.4f} "
            f"f1 score: {res_fold[4]:.4f} AUC: {res_fold[5]:.4f} "
        )
        results.append(res_fold)

    results = np.array(results, dtype=np.float64)
    # an all-NaN metric column (e.g. f1 on a fold set with no positives)
    # should aggregate to NaN silently, not warn on every green run
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message="Mean of empty slice")
        warnings.filterwarnings("ignore",
                                message="Degrees of freedom <= 0")
        res_mean = np.nanmean(results, axis=0)
        res_std = np.nanstd(results, axis=0)
    logger_main.print_message("************Final Results************")
    logger_main.print_message(
        "\n".join(
            f"{name}: {res_mean[i]:.4f} +- {res_std[i]:.4f}"
            for i, name in enumerate(METRIC_NAMES)
        )
    )
    print(f"The random seed is {seed}")
    return {
        "mean": res_mean.tolist(),
        "std": res_std.tolist(),
        "folds": results.tolist(),
        "seed": seed,
    }


def partition_dataset(data: List, ratios, shuffle: bool = True,
                      seed: Optional[int] = None) -> List[List]:
    """Fraction-based split (monai partition_dataset equivalent,
    reference: datasets/__init__.py:44,79)."""
    idx = np.arange(len(data))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    total = float(sum(ratios))
    parts, start = [], 0
    for i, r in enumerate(ratios):
        n = int(round(len(data) * r / total)) if i < len(ratios) - 1 else len(data) - start
        parts.append([data[j] for j in idx[start : start + n]])
        start += n
    return parts


def run_holdout(opt: Options) -> List[float]:
    """Hold-out driver (reference: train_adversarial.py:17-198).

    Dataset modes (reference: datasets/__init__.py:35-98):
     - 'ADNI':   60/20/20 partition of ADNI.csv (default)
     - 'ADNI12': train/val 80/20 on ADNI1_modality_complete.csv, test on
                 ADNI2_modality_complete.csv
     - task 'pretrain': 80/20 ADCN split with seed 965, no test set
    """
    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    primary = _init_multihost(opt)
    from ..parallel import NullLogger

    logger = Logger(save_dir) if primary else NullLogger()
    if opt.dataset == "ADNI12":
        adni1 = ADNI(opt.dataroot, "ADNI1_modality_complete.csv", opt.task)
        adni2 = ADNI(opt.dataroot, "ADNI2_modality_complete.csv", opt.task)
        train_d, val_d = partition_dataset(
            adni1.data_dict, [0.8, 0.2], shuffle=True, seed=task_seed(opt)
        )
        test_d = adni2.data_dict
    elif opt.task == "pretrain":
        data = ADNI(opt.dataroot, "ADNI.csv", "ADCN").data_dict
        train_d, val_d = partition_dataset(data, [0.8, 0.2], shuffle=True,
                                           seed=965)
        test_d = []
    else:
        data = ADNI(opt.dataroot, "ADNI.csv", opt.task).data_dict
        train_d, val_d, test_d = partition_dataset(
            data, [0.6, 0.2, 0.2], shuffle=True, seed=task_seed(opt)
        )
    if primary:  # partition snapshots: one writer on shared storage
        np.save(os.path.join(save_dir, "train.npy"), train_d,
                allow_pickle=True)
        np.save(os.path.join(save_dir, "val.npy"), val_d, allow_pickle=True)
        np.save(os.path.join(save_dir, "test.npy"), test_d,
                allow_pickle=True)

    source = VolumeSource(train_d + val_d + test_d,
                          dtype=transfer_dtype(opt))
    n1, n2 = len(train_d), len(train_d) + len(val_d)
    train_loader = Loader(source, list(range(n1)), opt.batch_size,
                          shuffle=True, drop_last=True, seed=task_seed(opt),
                          prefetch=opt.prefetch)
    val_loader = Loader(source, list(range(n1, n2)), opt.batch_size)
    test_loader = (Loader(source, list(range(n2, len(source))), opt.batch_size)
                   if test_d else None)

    model = {"Transformer": "ad", "CNN": "cnn_ad"}[opt.model]
    cfg = TrainerConfig(
        model=model, dim=opt.dim, depth=opt.trans_enc_depth,
        heads=8,  # hold-out head config (reference: train_adversarial.py:30-31)
        dropout=opt.dropout, optimizer=opt.optimizer, lr=opt.lr,
        weight_decay=opt.weight_decay, epochs=opt.epochs, aug=opt.aug_bool,
        aug_exact=str2bool(opt.aug_exact),
        seed=task_seed(opt), save_dir=save_dir,
        use_pallas=opt.use_pallas_opt, dtype=opt.dtype or "auto",
        resume=opt.resume == "True",
    )
    weights = dataset_weights(train_d)
    class_weights = weights if opt.use_class_weights == "True" else None
    trainer = Trainer(cfg, logger)
    res = trainer.fit(train_loader, val_loader, test_loader,
                      class_weights=class_weights)
    logger.print_message(f"Total params: {trainer.param_count()}")
    return res

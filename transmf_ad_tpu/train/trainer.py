"""High-level Trainer: the reference's `train_model` topology as a component.

Composes the jitted steps, event engine, metric accumulators, LR schedule,
best-checkpoint retention and test evaluation exactly like the reference
driver does with ignite (reference: kfold_train_adversarial.py:89-254):
per-epoch train metrics (accuracy, discriminator accuracies, mean ce/ad
loss), per-epoch validation (loss/acc/sen/spe/f1/AUC) with best-by-accuracy
checkpointing, and a final test pass with the best weights restored.
Returns the reference's res_fold = [loss, acc, sen, spe, f1, auc].

TPU notes: step outputs are kept as device arrays during the epoch (JAX
async dispatch keeps the pipeline full) and only materialized at epoch end;
a `latest` full-state checkpoint enables crash-resume (absent upstream).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import AugmentConfig
from ..models import ADVERSARIAL, SINGLE_MODALITY, build_model
from ..parallel import fetch_global as _fetch
from ..utils.logging import Logger
from . import checkpoint as ckpt
from .engine import Engine, Events
from .metrics import MetricState, confusion_metrics, roc_auc
from .optim import build_optimizer
from .steps import create_state, make_eval_step, make_train_step


@dataclass
class TrainerConfig:
    model: str = "ad"
    dim: int = 128
    depth: int = 3
    heads: int = 4
    dropout: float = 0.0
    optimizer: str = "Adam"
    lr: float = 1e-4
    weight_decay: float = 0.0
    momentum: float = 0.0
    milestones: Optional[Sequence[int]] = None  # None = reference defaults
    epochs: int = 40
    aug: bool = True
    aug_cfg: AugmentConfig = field(default_factory=AugmentConfig)
    seed: int = 42
    save_dir: str = "./checkpoints/run"
    use_pallas: Optional[bool] = None
    model_kwargs: Optional[dict] = None  # extra arch params for build_model
    dtype: Any = "auto"  # 'auto': bfloat16 on TPU, float32 elsewhere
    resume: bool = False
    save_latest_every: int = 0  # epochs between resume checkpoints; 0 = off
    data_parallel: bool = True  # shard batch over all devices when > 1
    model_parallel: int = 1  # tensor-parallel axis size (divides devices)
    # HBM-resident dataset cache: 'auto' caches train+val volumes on
    # device when they fit the budget (data/device_cache.py) — zero H2D
    # volume bytes per epoch after the first; 'off' always streams;
    # 'on' raises if the dataset exceeds the budget.
    device_cache: str = "auto"
    pretrained_path: str = ""  # load params/batch_stats before training
    # BN batch moments on duplicate-padded ragged batches (see pad_batch):
    # 'ragged' (default) routes ONLY short final batches through a
    # mask-weighted-BN step variant — reference short-batch BN semantics
    # at zero steady-state cost (the masked step costs +8.5% per step,
    # measured; full batches take the fast variant, and the masked one
    # never even compiles under drop_last). True masks every step;
    # False never masks (the duplicates then weight a few volumes twice
    # in the final batch's BN statistics, round-3 behavior).
    mask_bn: Any = "ragged"
    # Exact-MONAI augmentation (data/exact_monai.py): host-side per-sample
    # transforms replicating the reference MONAI pipeline per-op (for
    # cross-framework comparisons) instead of the fused device resample.
    # Implies float32 feed and disables the HBM dataset cache for the
    # train feed (host batches change every epoch).
    aug_exact: bool = False
    remat: bool = False  # rematerialize sNet encoders (activation memory)
    # (the reference only hints at this via a commented-out block,
    # reference: kfold_train_adversarial.py:80-83)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    profile_steps: tuple = (10, 15)  # (start, stop) step of the trace
    debug_nans: bool = False
    progress: bool = True  # per-iteration progress bar (ignite parity)
    # Multi-host: join jax's distributed runtime before building the mesh
    # (one trainer process per host of a pod slice; 'auto' = TPU-pod
    # detection). save_dir must be shared storage across hosts.
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def resolve_dtype(dtype):
    """Resolve a TrainerConfig.dtype spec to a concrete compute dtype.

    'auto' -> bfloat16 on TPU, None (float32) elsewhere; 'float32'/'f32'
    -> None; anything else is passed to jnp.dtype. Shared with the data
    layer so the host feed can cache/transfer volumes in the compute
    dtype (half the H2D bytes of float32 when training in bfloat16)."""
    if isinstance(dtype, str):
        if dtype == "auto":
            return jnp.bfloat16 if jax.default_backend() == "tpu" else None
        if dtype in ("float32", "f32"):
            return None
        return jnp.dtype(dtype)
    return dtype


def _enable_compile_cache():
    """Persistent XLA compile cache: folds 2..K of a k-fold run (and any
    rerun) reuse fold 1's executables instead of recompiling (~minutes per
    fold on the TPU tunnel). Opt out with TRANSMF_NO_COMPILE_CACHE=1."""
    from ..utils.env import env_flag

    if env_flag("TRANSMF_NO_COMPILE_CACHE"):
        return
    if jax.config.jax_compilation_cache_dir:
        return  # already configured by the caller
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "transmf_ad_tpu", "xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Trainer:
    def __init__(self, cfg: TrainerConfig, logger: Optional[Logger] = None):
        from ..parallel import init_distributed, is_primary

        self.cfg = cfg
        # must precede any other jax call (device queries below included)
        init_distributed(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
        self.primary = is_primary()
        if not self.primary:
            from ..parallel import NullLogger

            logger = NullLogger()  # side effects belong to process 0
        self.logger = logger or Logger(cfg.save_dir)
        _enable_compile_cache()
        dtype = resolve_dtype(cfg.dtype)
        self.dtype = dtype
        self.mesh = None
        self._batch_sharding = None
        self._replicated = None
        if cfg.data_parallel and jax.device_count() > 1:
            from ..parallel import make_hybrid_mesh

            n = jax.device_count()
            mp = max(1, cfg.model_parallel)
            if mp > 1 and cfg.dim < 1024:
                # soft gate: measured guidance says tensor parallelism
                # only pays from dim >= 1024 (shards >= 512 lanes wide);
                # below that it trades MXU fill + ICI collectives for
                # nothing (docs/ARCHITECTURE.md "Sizing guidance")
                self.logger.print_message(
                    f"WARNING: model_parallel={mp} at dim={cfg.dim}: "
                    "tensor parallelism rarely pays below dim 1024 — "
                    "data-parallel only is optimal at reference scale "
                    "(docs/ARCHITECTURE.md 'Sizing guidance')")
            # data axis first: under multi-host it is the axis split
            # across processes (gradient/BN psums ride DCN; 'model'
            # collectives stay on intra-host ICI)
            self.mesh = make_hybrid_mesh({"data": n // mp, "model": mp})
        # Under the mesh the steps run in shard_map (manual over 'data');
        # axis_name routes BatchNorm statistics through cross-device psums
        # so batch stats stay global-batch exact (synced BN).
        self.model = build_model(
            cfg.model, dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
            dropout=cfg.dropout, use_pallas=cfg.use_pallas, dtype=dtype,
            remat=cfg.remat,
            axis_name="data" if self.mesh is not None else None,
            **(cfg.model_kwargs or {}),
        )
        self.adversarial = cfg.model in ADVERSARIAL
        self.modalities: Tuple[str, ...] = (
            ("MRI",) if cfg.model in SINGLE_MODALITY else ("MRI", "PET")
        )
        self.state = None
        self.lr_schedule = None
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

    # ----- setup -----

    def init_state(self, sample_batch, steps_per_epoch: int):
        cfg = self.cfg
        tx, self.lr_schedule = build_optimizer(
            cfg.optimizer, cfg.lr, cfg.weight_decay, steps_per_epoch,
            milestones=cfg.milestones, momentum=cfg.momentum,
        )
        from .steps import dequantize_input

        inputs = [dequantize_input(jnp.asarray(sample_batch[k][..., None]))
                  for k in self.modalities]
        self.state = create_state(
            self.model, tx, inputs, jax.random.key(cfg.seed)
        )
        if cfg.pretrained_path:
            self.load_checkpoint(cfg.pretrained_path)
            self.logger.print_message(
                f"Load pre-training model {cfg.pretrained_path}")
        if self.mesh is not None:
            from ..parallel import batch_sharding, replicated, shard_state

            self.state = shard_state(self.state, self.mesh)
            self._batch_sharding = batch_sharding(self.mesh)
            self._replicated = replicated(self.mesh)
        return self.state

    def load_checkpoint(self, path: str):
        """Restore model weights (and batch stats) into the live state from
        a framework `.msgpack` checkpoint OR a reference torch `.pt`
        (mapped via utils/torch_import.py — ignite best_label_*.pt /
        pretrainAD.pt, reference: kfold_train_adversarial.py:80-83,231-233).
        Requires `init_state` to have run (shapes come from the live tree).
        """
        if self.state is None:
            raise RuntimeError("load_checkpoint requires init_state first")
        if path.endswith((".pt", ".pth")):
            from ..utils.torch_import import import_torch_checkpoint

            restored = import_torch_checkpoint(
                path, self.cfg.model,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats})
        else:
            restored = ckpt.load(path, _saveable(self.state))
        self.state = _restore_state(self.state, restored)
        if self.mesh is not None:
            from ..parallel import shard_state

            self.state = shard_state(self.state, self.mesh)
        return self.state

    def evaluate_from_checkpoint(self, loader, checkpoint_path: str) -> dict:
        """Public one-call scoring entry: initialize (if needed), restore
        `checkpoint_path` (framework .msgpack or reference torch .pt) and
        run the full test-metric pass over `loader`. This is the
        standalone-evaluation surface the reference only offers inside a
        training run (reference: kfold_train_adversarial.py:229-250)."""
        if self.state is None:
            sample = (loader.peek() if hasattr(loader, "peek")
                      else next(iter(loader)))
            self.init_state(sample, steps_per_epoch=1)
        self.load_checkpoint(checkpoint_path)
        return self.evaluate(loader)

    def _data_axis_size(self) -> int:
        return self.mesh.shape["data"] if self.mesh is not None else 1

    def _pad_eval_batch(self, batch, pad_to: int):
        """Pad the batch to a fixed leading size and attach a validity mask:
        ONE eval compile for ragged final batches, and a shape every mesh
        can shard (the reference recompiles nothing because torch is eager;
        here fixed shapes are the XLA-native equivalent)."""
        n = batch["label"].shape[0]
        out = {}
        for k in (*self.modalities, "label"):
            v = np.asarray(batch[k])
            if n < pad_to:
                pad = np.zeros((pad_to - n, *v.shape[1:]), v.dtype)
                v = np.concatenate([v, pad])
            out[k] = v
        mask = np.zeros(pad_to, np.float32)
        mask[:n] = 1.0
        out["mask"] = mask
        return out

    def _place(self, batch):
        """Host->device placement; batch axes are pre-padded to divide the
        mesh's data axis, so sharded placement never fails. Multi-host,
        each process transfers only the rows its devices own."""
        if self._batch_sharding is not None:
            from ..parallel import place_global

            return place_global(batch, self._batch_sharding)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def param_count(self) -> int:
        return sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.state.params)
        )

    # ----- evaluation -----

    def _eval_epoch(self, loader):
        """One padded/masked pass: device-side MetricState accumulation
        plus per-batch probs/labels (tiny fetches) for exact ROC-AUC."""
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = make_eval_step(self.modalities, self.adversarial,
                                             mesh=self.mesh)
        eval_step = self._eval_step
        n_data = self._data_axis_size()
        pad_to = None
        ms = MetricState.zero()
        if self._replicated is not None:
            # match the sharding the step's output carries, so batch 2..N
            # hit the same executable as batch 1
            ms = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._replicated), ms)
        probs, labels, masks = [], [], []
        from ..utils.progress import iter_progress

        it = iter_progress(loader, total=len(loader) if hasattr(
            loader, "__len__") else None, label="Evaluating",
            enabled=self.cfg.progress)
        device_resident = getattr(loader, "device_resident", False)
        for b in it:
            b.pop("_n_real", None)  # host metadata (train-only dispatch)
            if device_resident:
                dev = b  # already padded+masked+sharded by the HBM cache
            else:
                if pad_to is None:
                    base = (getattr(loader, "batch_size", None)
                            or b["label"].shape[0])
                    pad_to = -(-max(base, b["label"].shape[0])
                               // n_data) * n_data
                dev = self._place(self._pad_eval_batch(b, pad_to))
            ms, out = eval_step(self.state, ms, dev)
            probs.append(out["probs"])
            labels.append(out["label"])
            masks.append(out["mask"])
        probs = np.concatenate([_fetch(p) for p in probs])
        labels = np.concatenate([_fetch(l) for l in labels])
        valid = np.concatenate([_fetch(m) for m in masks]) > 0
        return ms, probs[valid], labels[valid]

    def evaluate(self, loader) -> dict:
        ms, probs, labels = self._eval_epoch(loader)
        conf = np.asarray(ms.confusion)
        total = float(ms.total)
        m = confusion_metrics(conf)
        return {
            "loss": float(ms.loss_sum) / total,
            "accuracy": float(ms.correct) / total,
            "auc": roc_auc(probs, labels),
            "confusion": conf,
            **m,
        }

    def predict(self, loader):
        """Inference: positive-class probabilities + labels over a loader."""
        _, probs, labels = self._eval_epoch(loader)
        return probs, labels

    # ----- training -----

    def fit(self, train_loader, val_loader, test_loader=None,
            class_weights=None):
        cfg = self.cfg
        logger = self.logger
        steps_per_epoch = max(1, len(train_loader))
        sample = (train_loader.peek() if hasattr(train_loader, "peek")
                  else next(iter(train_loader)))
        if self.state is None:
            self.init_state(sample, steps_per_epoch)

        exact_aug = cfg.aug and cfg.aug_exact
        aug_cfg = cfg.aug_cfg if (cfg.aug and not exact_aug) else None
        if exact_aug:
            _missing = object()
            st = getattr(train_loader, "sample_transform", _missing)
            if st is _missing:
                # a loader with no hook would otherwise train with NO
                # augmentation despite --aug_exact True
                raise ValueError(
                    "aug_exact=True but the train loader has no "
                    "sample_transform hook (use data.pipeline.Loader, or "
                    "apply data.exact_monai.make_sample_transform yourself)")
            if st is None:
                from ..data.exact_monai import make_sample_transform

                st = make_sample_transform(cfg.seed + 7, cfg.aug_cfg)
                if self.dtype is not None:
                    # bf16 compute: cast AFTER the exact f32 transform so
                    # the H2D transfer is half the bytes — the same
                    # quantization the production bf16 feed applies; the
                    # MONAI-exact math itself still runs in float32
                    # (the f32 SOURCE cache is what exactness needs)
                    st = _cast_after_transform(st, self.modalities,
                                               self.dtype)
                train_loader.sample_transform = st
        step_kw = dict(aug_cfg=aug_cfg, class_weights=class_weights,
                       mesh=self.mesh)
        train_step = make_train_step(
            self.modalities, self.adversarial,
            mask_bn=(cfg.mask_bn is True), **step_kw)
        # jit is lazy: the masked variant only compiles if a ragged batch
        # actually appears (never, under drop_last variants)
        train_step_masked = (
            make_train_step(self.modalities, self.adversarial,
                            mask_bn=True, **step_kw)
            if cfg.mask_bn == "ragged" else train_step)
        self._eval_step = make_eval_step(self.modalities, self.adversarial,
                                         mesh=self.mesh)

        # ---- feeds ----
        # Preferred: HBM-resident dataset cache (zero H2D volume bytes per
        # epoch after the one-time fill; batches gathered on device).
        # Fallback: streaming DeviceFeed (double-buffered H2D, sharded over
        # the data axis), e.g. full-resolution sets over the HBM budget.
        from ..data.device_cache import (DeviceCachedFeed, HybridCachedFeed,
                                         cache_bytes, hbm_budget)
        from ..data.pipeline import DeviceFeed

        n_data = self._data_axis_size()
        base = (getattr(train_loader, "batch_size", None)
                or sample["label"].shape[0])
        pad_to = -(-base // n_data) * n_data
        feed = train_loader
        val_feed = val_loader
        already_fed = (isinstance(train_loader, DeviceFeed)
                       or getattr(train_loader, "device_resident", False))
        if not already_fed and not exact_aug \
                and cfg.device_cache in ("auto", "on", "hybrid") \
                and hasattr(train_loader, "source"):
            budget = hbm_budget()
            tb = cache_bytes(train_loader, self.mesh)
            if tb <= budget and cfg.device_cache != "hybrid":
                feed = DeviceCachedFeed(train_loader, self.mesh,
                                        pad_to=pad_to)
                vb = (cache_bytes(val_loader, self.mesh)
                      if hasattr(val_loader, "source") else budget)
                if tb + vb <= budget:
                    val_feed = DeviceCachedFeed(val_loader, self.mesh)
                logger.print_message(
                    f"HBM dataset cache: train {tb / 2**20:.0f} MB/device"
                    + ("" if val_feed is val_loader
                       else f" + val {vb / 2**20:.0f} MB/device")
                    + f" (budget {budget / 2**20:.0f} MB)")
            elif self.mesh is None \
                    and cfg.device_cache in ("auto", "hybrid"):
                # over-budget (or forced): hot fraction in HBM, cold rows
                # streamed — per-epoch H2D bytes shrink by the hot fraction
                hybrid = HybridCachedFeed(train_loader, pad_to=pad_to,
                                          budget=budget)
                if hybrid.n_hot >= 2 * base or cfg.device_cache == "hybrid":
                    feed = hybrid
                    logger.print_message(
                        f"HBM hybrid cache: {hybrid.n_hot}/"
                        f"{len(train_loader.indices)} train volumes hot "
                        f"({100 * hybrid.hot_fraction:.0f}%; "
                        f"budget {budget / 2**20:.0f} MB, full set needs "
                        f"{tb / 2**20:.0f} MB)")
            elif cfg.device_cache == "on":
                raise ValueError(
                    f"device_cache='on' but the training set needs "
                    f"{tb / 2**20:.0f} MB/device > budget "
                    f"{budget / 2**20:.0f} MB (set TRANSMF_CACHE_BUDGET_MB "
                    f"or use device_cache='auto' to stream)")
        elif cfg.device_cache == "on" \
                and not getattr(train_loader, "device_resident", False):
            # 'on' promises caching for ANY reason it cannot happen, not
            # just budget overflow: a pre-wrapped DeviceFeed / sourceless
            # loader or aug_exact's per-epoch host transforms all stream
            why = ("aug_exact host transforms change batches every epoch"
                   if exact_aug else
                   "the loader exposes no .source to cache (pre-wrapped "
                   "feed?)")
            raise ValueError(
                f"device_cache='on' but the train feed cannot be cached: "
                f"{why}; use device_cache='auto' to stream")
        if feed is train_loader and not isinstance(train_loader, DeviceFeed):
            feed = DeviceFeed(train_loader, self._batch_sharding, depth=2,
                              pad_to=pad_to)

        base_rng = jax.random.key(cfg.seed + 1)

        checkpointer = ckpt.BestCheckpointer(cfg.save_dir)
        epoch_outputs = []
        start_epoch = 0

        if cfg.resume:
            # Target must carry opt_state + step: flax from_bytes silently
            # drops saved keys absent from the target, which would reset
            # Adam moments and the step-indexed LR schedule.
            try:
                restored = ckpt.load_latest(cfg.save_dir, {
                    "state": _saveable(self.state, full=True), "epoch": 0,
                })
            except ValueError:
                # checkpoint predates full-state saving: restore weights
                # only, and say so (never silently reset the optimizer)
                restored = ckpt.load_latest(cfg.save_dir, {
                    "state": _saveable(self.state), "epoch": 0,
                })
                if restored is not None:
                    logger.print_message(
                        "WARNING: latest checkpoint has no optimizer state; "
                        "resuming weights only (Adam moments and LR-schedule "
                        "position reset)")
            if restored is not None:
                self.state = _restore_state(self.state, restored["state"])
                if self.mesh is not None:
                    from ..parallel import shard_state

                    self.state = shard_state(self.state, self.mesh)
                start_epoch = int(restored["epoch"])
                logger.print_message(f"Resumed from epoch {start_epoch}")

        if self.mesh is not None and self._replicated is not None:
            from ..parallel import put_replicated

            base_rng = put_replicated(base_rng, self._replicated)

        def step_fn(engine, batch):
            if cfg.profile_dir:
                if engine.state.iteration == cfg.profile_steps[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                elif engine.state.iteration == cfg.profile_steps[1]:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), self.state.params)
                    jax.profiler.stop_trace()
            # host-side real-sample count the feeds attach (never traced);
            # a short final batch routes to the mask-weighted-BN variant
            n_real = batch.pop("_n_real", None)
            ragged = (n_real is not None
                      and n_real < batch["label"].shape[0])
            step = train_step_masked if ragged else train_step
            self.state, aux = step(self.state, batch, base_rng)
            epoch_outputs.append(aux)  # device arrays; not synced here
            return aux

        trainer = Engine(step_fn)

        if cfg.progress:
            # per-iteration progress (ignite ProgressBar parity,
            # reference: kfold_train_adversarial.py:139); counts async
            # dispatches — it never syncs the device mid-epoch
            from ..utils.progress import ProgressBar

            ProgressBar(persist=True).attach(
                trainer, total=max(1, len(train_loader)))

        @trainer.on(Events.EPOCH_COMPLETED)
        def log_train(engine):
            outs = list(epoch_outputs)
            epoch_outputs.clear()
            if not outs:  # drop_last can empty a tiny fold's epoch
                logger.print_message(
                    f"Training Results - Epoch[{engine.state.epoch}] "
                    "(no full batches)")
                return
            ce = float(np.mean([_fetch(o["ce_loss"]) for o in outs]))
            ad = float(np.mean([_fetch(o["ad_loss"]) for o in outs]))
            logits = np.concatenate([_fetch(o["logits"]) for o in outs])
            labels = np.concatenate([_fetch(o["label"]) for o in outs])
            if "mask" in outs[0]:  # drop padded duplicates from metrics
                valid = np.concatenate(
                    [_fetch(o["mask"]) for o in outs]) > 0
                logits, labels = logits[valid], labels[valid]
            acc = float((logits.argmax(-1) == labels).mean())
            lr = float(self.lr_schedule(int(self.state.step) - 1))
            n_samples = labels.shape[0]
            # the loop only dispatches async device work; the np.asarray
            # fetches above are the sync point, so measure the epoch here
            epoch_time = time.perf_counter() - engine.state.epoch_t0
            engine.state.epoch_time = epoch_time
            vps = n_samples / epoch_time if epoch_time else 0
            logger.print_message("-------------------------------------------------")
            logger.print_message(f"Current learning rate: {lr}")
            logger.print_message(
                f"Epoch time: {epoch_time:.2f}s "
                f"({vps:.2f} volumes/s)"
            )
            logger.print_message(f"Training Results - Epoch[{engine.state.epoch}] ")
            msg = f"ce_loss: {ce:.4f} ad_loss: {ad:.4f} accuracy: {acc:.4f} "
            if self.adversarial:
                d_mri = np.concatenate([_fetch(o["d_mri"]) for o in outs])
                d_pet = np.concatenate([_fetch(o["d_pet"]) for o in outs])
                if "mask" in outs[0]:
                    d_mri, d_pet = d_mri[valid], d_pet[valid]
                mri_acc = float((d_mri.argmax(-1) == 1).mean())
                pet_acc = float((d_pet.argmax(-1) == 0).mean())
                msg += f"MRIaccuracy: {mri_acc:.4f} PETaccuracy: {pet_acc:.4f} "
            engine.state.metrics["train_accuracy"] = acc
            logger.print_message(msg)

        @trainer.on(Events.EPOCH_COMPLETED)
        def validate(engine):
            metrics = self.evaluate(val_feed)
            logger.print_message(
                f"Validation Results - Epoch[{engine.state.epoch}] "
            )
            logger.print_message(_fmt_metrics(metrics))
            engine.state.metrics["val"] = metrics
            # Multi-host: the val metrics (and so the best-epoch decision)
            # are identical on every process; only process 0 writes. The
            # barrier keeps non-primary hosts from racing ahead into a
            # best-weights restore before the file lands (shared storage).
            if self.primary:
                checkpointer.maybe_save(
                    _saveable(self.state), metrics["accuracy"],
                    engine.state.epoch
                )
                if cfg.save_latest_every and (
                    engine.state.epoch % cfg.save_latest_every == 0
                ):
                    ckpt.save_latest(cfg.save_dir, {
                        "state": _saveable(self.state, full=True),
                        "epoch": engine.state.epoch,
                    })
            else:
                checkpointer.track(metrics["accuracy"], engine.state.epoch)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("transmf_ckpt")

        trainer.run(feed, cfg.epochs, start_epoch=start_epoch)

        res_fold = None
        if test_loader is not None:
            best = checkpointer.best_path()
            if best is not None:
                restored = ckpt.load(best, _saveable(self.state))
                self.state = _restore_state(self.state, restored)
                if self.mesh is not None:
                    from ..parallel import shard_state

                    self.state = shard_state(self.state, self.mesh)
                logger.print_message(f"Load best model {best}")
            metrics = self.evaluate(test_loader)
            logger.print_message("*" * 62)
            logger.print_message("Test Results")
            logger.print_message(_fmt_metrics(metrics))
            res_fold = [metrics["loss"], metrics["accuracy"], metrics["sen"],
                        metrics["spe"], metrics["f1"], metrics["auc"]]
        return res_fold


def _cast_after_transform(st, modalities, dtype):
    """Wrap a host sample_transform to cast volume keys to the compute
    dtype AFTER the exact f32 transform (halves aug_exact H2D bytes when
    training in bfloat16)."""
    np_dtype = np.dtype(dtype)

    def wrapped(item):
        out = dict(st(item))
        for k in modalities:
            out[k] = np.asarray(out[k]).astype(np_dtype)
        return out

    return wrapped


def _fmt_metrics(m: dict) -> str:
    return (
        f"loss: {m['loss']:.4f} accuracy: {m['accuracy']:.4f} "
        f"sensitivity: {m['sen']:.4f} specificity: {m['spe']:.4f} "
        f"f1 score: {m['f1']:.4f} AUC: {m['auc']:.4f} "
    )


def _saveable(state, full: bool = False):
    out = {"params": state.params, "batch_stats": state.batch_stats}
    if full:
        out["opt_state"] = state.opt_state
        out["step"] = state.step
    return out


def _restore_state(state, restored):
    kw = dict(params=restored["params"], batch_stats=restored["batch_stats"])
    if "opt_state" in restored:
        kw["opt_state"] = restored["opt_state"]
    if "step" in restored:
        kw["step"] = jnp.asarray(restored["step"], jnp.int32)
    return state.replace(**kw)

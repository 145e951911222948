"""Subprocess worker for tests/test_multihost.py: one PROCESS of a
2-process (Gloo) CPU run, 4 virtual devices each -> an 8-device global
mesh. Runs the full Trainer.fit loop (sharded steps, multi-host feed,
primary-gated checkpointing, eval) on deterministic synthetic data and
dumps final params + metrics for cross-process / vs-single-process
comparison.

Usage: python tests/_multihost_worker.py <pid> <nproc> <port> <outdir>
                                         [<adni_root> | resume1 | resume2]
(spawned with XLA_FLAGS=--xla_force_host_platform_device_count=4).
With <adni_root>: cache mode — real VolumeSource loaders over a synthetic
ADNI tree with device_cache='on', counting which NIfTI files THIS process
decodes, so the test can assert the HBM cache fill is split by shard
ownership across processes (no duplicated host decode).
With resume1/resume2: crash-resume mode — phase 1 trains 2 of 4 epochs
(plus a straight-4-epoch control) and EXITS; phase 2 is a fresh process
group that resumes from the shared latest.msgpack and must reproduce the
control bit-for-bit.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else None

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon rewrites JAX_PLATFORMS

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig
    from tests._multihost_data import make_loaders, trainer_config_kwargs

    if mode in ("resume1", "resume2"):
        return resume_mode(pid, nproc, port, outdir, mode)
    if mode is not None:
        return cache_mode(pid, nproc, port, outdir, mode)

    cfg = TrainerConfig(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        save_dir=os.path.join(outdir, "ckpt"),
        **trainer_config_kwargs(),
    )
    trainer = Trainer(cfg)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 4 * nproc

    train_loader, val_loader, test_loader = make_loaders()
    res = trainer.fit(train_loader, val_loader, test_loader)

    from transmf_ad_tpu.parallel import fetch_global

    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    flat = np.concatenate([fetch_global(p).ravel() for p in leaves])
    np.save(os.path.join(outdir, f"params_{pid}.npy"), flat)
    with open(os.path.join(outdir, f"res_{pid}.json"), "w") as f:
        json.dump({"res": [float(x) for x in res],
                   "primary": bool(trainer.primary)}, f)
    print(f"WORKER_{pid}_OK", flush=True)


def resume_mode(pid, nproc, port, outdir, phase):
    """Multi-host crash-resume across a REAL process restart.

    phase 'resume1': train 2 of 4 epochs into ckpt_resume (latest saved
    each epoch) and exit — the 'crash'; then train a straight 4-epoch
    control into ckpt_control within the same process group.
    phase 'resume2' (a fresh process group, fresh processes): resume from
    ckpt_resume's shared latest.msgpack to epoch 4. Because the resume
    restores opt_state + step (LR-schedule position, fold-in RNG) and the
    batch stream is deterministic, the resumed params must equal the
    straight-run control's.
    """
    import jax
    import numpy as np

    from tests._multihost_data import make_loaders, trainer_config_kwargs
    from transmf_ad_tpu.parallel import fetch_global
    from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

    kwargs = trainer_config_kwargs()

    def flat_params(trainer):
        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        return np.concatenate([fetch_global(p).ravel() for p in leaves])

    if phase == "resume1":
        cfg = TrainerConfig(
            coordinator_address=f"localhost:{port}", num_processes=nproc,
            process_id=pid, save_dir=os.path.join(outdir, "ckpt_resume"),
            **kwargs)  # epochs=2, save_latest_every=1
        Trainer(cfg).fit(*make_loaders())
        kw4 = dict(kwargs, epochs=4)
        cfg_ctl = TrainerConfig(
            coordinator_address=f"localhost:{port}", num_processes=nproc,
            process_id=pid, save_dir=os.path.join(outdir, "ckpt_control"),
            **kw4)
        t = Trainer(cfg_ctl)
        t.fit(*make_loaders())
        np.save(os.path.join(outdir, f"control_params_{pid}.npy"),
                flat_params(t))
    else:
        kw4 = dict(kwargs, epochs=4)
        cfg = TrainerConfig(
            coordinator_address=f"localhost:{port}", num_processes=nproc,
            process_id=pid, save_dir=os.path.join(outdir, "ckpt_resume"),
            resume=True, **kw4)
        t = Trainer(cfg)
        t.fit(*make_loaders())
        np.save(os.path.join(outdir, f"resumed_params_{pid}.npy"),
                flat_params(t))
    print(f"WORKER_{pid}_OK", flush=True)


def cache_mode(pid, nproc, port, outdir, adni_root):
    """device_cache='on' over a real VolumeSource: the HBM fill must
    decode only this process's shard-owned rows (data/device_cache.py
    make_array_from_callback path)."""
    import jax
    import numpy as np

    from tests._multihost_data import trainer_config_kwargs
    from transmf_ad_tpu.data.adni import ADNI
    from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
    from transmf_ad_tpu.parallel import fetch_global
    from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

    def _relname(path):
        return os.path.join(os.path.basename(os.path.dirname(path)),
                            os.path.basename(path))

    recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
    train_src = VolumeSource(recs[:24])
    decoded = []
    orig = train_src._decode_vol

    def counting(path):
        # keep the modality dir: MRI/x.nii.gz and PET/x.nii.gz share basenames
        decoded.append(_relname(path))
        return orig(path)

    train_src._decode_vol = counting
    val_src = VolumeSource(recs[24:28])

    train = Loader(train_src, batch_size=8, shuffle=True, seed=5,
                   drop_last=True)
    val = Loader(val_src, batch_size=4)

    cfg = TrainerConfig(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        save_dir=os.path.join(outdir, "ckpt_cache"),
        device_cache="on",
        **trainer_config_kwargs(),
    )
    trainer = Trainer(cfg)
    res = trainer.fit(train, val, val)

    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    flat = np.concatenate([fetch_global(p).ravel() for p in leaves])
    np.save(os.path.join(outdir, f"cache_params_{pid}.npy"), flat)
    peek_files = [_relname(recs[i][k]) for i in range(8)
                  for k in ("MRI", "PET")]
    train_files = [_relname(recs[i][k]) for i in range(24)
                   for k in ("MRI", "PET")]
    with open(os.path.join(outdir, f"cache_res_{pid}.json"), "w") as f:
        json.dump({"res": [float(x) for x in res],
                   "decoded": decoded,
                   "peek_files": peek_files,
                   "train_files": train_files}, f)
    print(f"WORKER_{pid}_OK", flush=True)


if __name__ == "__main__":
    main()

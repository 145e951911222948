"""Subprocess worker for tests/test_multihost.py: one PROCESS of a
2-process (Gloo) CPU run, 4 virtual devices each -> an 8-device global
mesh. Runs the full Trainer.fit loop (sharded steps, multi-host feed,
primary-gated checkpointing, eval) on deterministic synthetic data and
dumps final params + metrics for cross-process / vs-single-process
comparison.

Usage: python tests/_multihost_worker.py <pid> <nproc> <port> <outdir>
(spawned with XLA_FLAGS=--xla_force_host_platform_device_count=4)
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon rewrites JAX_PLATFORMS

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig
    from tests._multihost_data import make_loaders, trainer_config_kwargs

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


if __name__ == "__main__":
    main()

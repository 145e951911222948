"""Multi-host training: the full Trainer loop as TWO JAX processes (Gloo
over localhost, 4 virtual CPU devices each = one 8-device global mesh),
compared against the same config run single-process on this test's own
8-device mesh.

This is the multi-host analogue of tests/test_parallel.py: it exercises
`parallel.distributed` end to end — `jax.distributed.initialize`, the
DCN-aware hybrid mesh, per-process `place_global` batch transfer,
`fetch_global` metric collection, primary-gated checkpoint writes with the
cross-host barrier, and NullLogger on the non-primary process. The
reference has no distributed story at all (reference:
kfold_train_adversarial.py:24 pins cuda:0).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("multihost"))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), outdir],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    for pid, (p, out) in enumerate(zip(procs, logs)):
        assert p.returncode == 0 and f"WORKER_{pid}_OK" in out, (
            f"worker {pid} failed:\n{out[-4000:]}")
    return outdir, logs


@pytest.fixture(scope="module")
def multihost_cache_run(tmp_path_factory):
    """Two processes training over a real VolumeSource with the
    HBM-resident dataset cache forced on (device_cache='on')."""
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni

    outdir = str(tmp_path_factory.mktemp("multihost_cache"))
    adni_root = os.path.join(outdir, "adni")
    make_synthetic_adni(adni_root, n_per_group=14, shape=(16, 16, 16),
                        seed=4)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), outdir,
             adni_root],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    for pid, (p, out) in enumerate(zip(procs, logs)):
        assert p.returncode == 0 and f"WORKER_{pid}_OK" in out, (
            f"cache worker {pid} failed:\n{out[-4000:]}")
    return outdir, logs


@pytest.fixture(scope="module")
def multihost_resume_run(tmp_path_factory):
    """Crash-resume across a REAL restart: one 2-process group trains 2 of
    4 epochs (+ a straight-4 control) and exits; a FRESH 2-process group
    resumes from the shared latest.msgpack to epoch 4."""
    outdir = str(tmp_path_factory.mktemp("multihost_resume"))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    logs = {}
    for phase in ("resume1", "resume2"):
        port = _free_port()  # fresh coordinator per process group
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), outdir,
                 phase],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0 and f"WORKER_{pid}_OK" in out, (
                f"{phase} worker {pid} failed:\n{out[-4000:]}")
        logs[phase] = outs
    return outdir, logs


class TestMultiHost:
    def test_processes_agree(self, multihost_run):
        outdir, _ = multihost_run
        p0 = np.load(os.path.join(outdir, "params_0.npy"))
        p1 = np.load(os.path.join(outdir, "params_1.npy"))
        np.testing.assert_array_equal(p0, p1)
        r0 = json.load(open(os.path.join(outdir, "res_0.json")))
        r1 = json.load(open(os.path.join(outdir, "res_1.json")))
        assert r0["primary"] and not r1["primary"]
        # test metrics come from the same psum'd eval on both processes
        np.testing.assert_allclose(r0["res"], r1["res"], rtol=1e-6)

    def test_matches_single_process(self, multihost_run, tmp_path):
        """Same config, single-controller on this process's own 8-device
        mesh: the distributed run must reproduce it numerically."""
        from tests._multihost_data import make_loaders, trainer_config_kwargs
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        cfg = TrainerConfig(save_dir=str(tmp_path / "ckpt"),
                            **trainer_config_kwargs())
        trainer = Trainer(cfg)
        assert trainer.mesh is not None and trainer.mesh.shape["data"] == 8
        train_loader, val_loader, test_loader = make_loaders()
        res = trainer.fit(train_loader, val_loader, test_loader)

        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        flat = np.concatenate([np.asarray(p).ravel() for p in leaves])

        outdir, _ = multihost_run
        p0 = np.load(os.path.join(outdir, "params_0.npy"))
        np.testing.assert_allclose(p0, flat, rtol=2e-5, atol=2e-6)
        r0 = json.load(open(os.path.join(outdir, "res_0.json")))
        np.testing.assert_allclose(r0["res"], [float(x) for x in res],
                                   rtol=1e-4, atol=1e-5)

    def test_device_cache_splits_decode_across_processes(
            self, multihost_cache_run):
        """The HBM cache fill decodes each volume on exactly ONE process
        (shard ownership), not on every process — the multi-host claim of
        data/device_cache.py:14-18. Rows the trainer's init `peek`
        touches are decoded everywhere (shape probing, 8 samples); the
        remaining fill rows must partition cleanly. Both processes must
        also end bit-identical."""
        outdir, _ = multihost_cache_run
        r0 = json.load(open(os.path.join(outdir, "cache_res_0.json")))
        r1 = json.load(open(os.path.join(outdir, "cache_res_1.json")))
        peek = set(r0["peek_files"])
        fill_rows = set(r0["train_files"]) - peek
        d0 = [f for f in r0["decoded"] if f in fill_rows]
        d1 = [f for f in r1["decoded"] if f in fill_rows]
        # no file decoded twice on one process (RAM cache) ...
        assert len(d0) == len(set(d0)) and len(d1) == len(set(d1))
        # ... none decoded on BOTH processes, and together they cover all
        assert set(d0).isdisjoint(set(d1)), set(d0) & set(d1)
        assert set(d0) | set(d1) == fill_rows
        # both processes did real work (8-device data axis, 4 local each)
        assert d0 and d1

        p0 = np.load(os.path.join(outdir, "cache_params_0.npy"))
        p1 = np.load(os.path.join(outdir, "cache_params_1.npy"))
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_allclose(r0["res"], r1["res"], rtol=1e-6)

    def test_resume_across_restart_matches_straight_run(
            self, multihost_resume_run):
        """A fresh process group resuming from the shared latest.msgpack
        (opt state + step restored) reproduces the uninterrupted 4-epoch
        control run, and both processes agree."""
        outdir, logs = multihost_resume_run
        r0 = np.load(os.path.join(outdir, "resumed_params_0.npy"))
        r1 = np.load(os.path.join(outdir, "resumed_params_1.npy"))
        c0 = np.load(os.path.join(outdir, "control_params_0.npy"))
        np.testing.assert_array_equal(r0, r1)
        np.testing.assert_allclose(r0, c0, rtol=1e-6, atol=1e-7)
        # the resumed group actually restarted from epoch 2, not 0
        assert any("Resumed from epoch 2" in out
                   for out in logs["resume2"]), logs["resume2"][0][-2000:]

    def test_primary_owns_side_effects(self, multihost_run):
        outdir, _ = multihost_run
        ckpt_dir = os.path.join(outdir, "ckpt")
        # exactly one writer: the shared dir has the usual artifacts once
        names = os.listdir(ckpt_dir)
        assert "latest.msgpack" in names
        assert any(n.startswith("best_label_net_model") for n in names)
        assert "log.txt" in names  # process 0's Logger only

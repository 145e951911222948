"""Multi-device tests on the 8-way virtual CPU mesh: sharded training step
parity vs single device, mesh construction, sharding rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_state,
)
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _make(rng, batch=8, shape=(16, 16, 16), dim=8, optimizer="SGD"):
    # SGD for parity tests: the update is linear in the gradient, so
    # cross-shard reduction-order noise stays O(lr * 1e-7); Adam's
    # normalized first step would amplify it to O(lr).
    model = build_model("cnn_ad", dim=dim)
    tx, _ = build_optimizer(optimizer, 1e-2, steps_per_epoch=1)
    batch_d = {
        "MRI": rng.standard_normal((batch, *shape)).astype(np.float32),
        "PET": rng.standard_normal((batch, *shape)).astype(np.float32),
        "label": rng.integers(0, 2, batch).astype(np.int32),
    }
    state = create_state(
        model, tx,
        [jnp.asarray(batch_d["MRI"][..., None]),
         jnp.asarray(batch_d["PET"][..., None])],
        jax.random.key(0),
    )
    return model, state, batch_d


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh({"data": -1, "model": 2})
        assert mesh.shape["data"] == len(jax.devices()) // 2

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 1024})

    def test_param_sharding_rules(self):
        mesh = make_mesh({"data": 4, "model": 2})
        params = {
            "kernel": jnp.zeros((64, 64)),   # shardable
            "bias": jnp.zeros((64,)),        # 1D -> replicated
            "odd": jnp.zeros((8, 33)),       # 33 % 2 != 0 -> replicated
        }
        sh = param_shardings(params, mesh)
        assert sh["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
        assert sh["bias"].spec == jax.sharding.PartitionSpec()
        assert sh["odd"].spec == jax.sharding.PartitionSpec()


class TestShardedStep:
    def test_dp_step_matches_single_device(self, rng):
        """One train step, replicated vs (data=4, model=2)-sharded, must
        produce numerically close parameters (global-batch BN semantics are
        identical because jit sees the global batch either way)."""
        model, state0, batch = _make(rng)
        step = make_train_step(("MRI", "PET"), adversarial=True, aug_cfg=None,
                               donate=False)
        key = jax.random.key(3)

        # single-device
        s_single, aux_single = step(state0, {k: jnp.asarray(v) for k, v in batch.items()}, key)

        # sharded
        mesh = make_mesh({"data": 4, "model": 2})
        state_sh = shard_state(state0, mesh)
        bs = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
        s_shard, aux_shard = step(state_sh, dev_batch,
                                  jax.device_put(key, replicated(mesh)))

        np.testing.assert_allclose(
            float(aux_single["loss"]), float(aux_shard["loss"]), rtol=1e-4
        )
        flat1 = jax.tree_util.tree_leaves(s_single.params)
        flat2 = jax.tree_util.tree_leaves(s_shard.params)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3)

    def test_batch_stats_are_global(self, rng):
        """BN batch stats after a sharded step equal the single-device stats
        (synced-BN over the global batch)."""
        model, state0, batch = _make(rng, batch=8)
        step = make_train_step(("MRI", "PET"), adversarial=True, aug_cfg=None,
                               donate=False)
        key = jax.random.key(0)
        s_single, _ = step(state0, {k: jnp.asarray(v) for k, v in batch.items()}, key)

        mesh = make_mesh({"data": 8})
        state_sh = shard_state(state0, mesh)
        bs = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
        s_shard, _ = step(state_sh, dev_batch,
                          jax.device_put(key, replicated(mesh)))
        m1 = jax.tree_util.tree_leaves(s_single.batch_stats)
        m2 = jax.tree_util.tree_leaves(s_shard.batch_stats)
        for a, b in zip(m1, m2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


class TestShardMapKernels:
    """The production composition: Pallas kernels under a sharded mesh.

    make_train_step(mesh=...) wraps the step in jax.shard_map (manual over
    'data'); with use_pallas=True the kernels run in interpret mode on the
    CPU mesh (ops/_common.py::auto_interpret), so these tests exercise the
    exact kernel call graph the TPU runs, sharded."""

    def _run_pair(self, rng, model_name, model_kw, batch=8, shape=(16, 16, 16),
                  aug_cfg=None, n_data=4, model_parallel=True, dim=8):
        from transmf_ad_tpu.data.transforms import AugmentConfig

        adversarial = model_name in ("cnn_ad", "ad")
        mk = dict(dim=dim, use_pallas=True, **model_kw)
        batch_d = {
            "MRI": rng.standard_normal((batch, *shape)).astype(np.float32),
            "PET": rng.standard_normal((batch, *shape)).astype(np.float32),
            "label": rng.integers(0, 2, batch).astype(np.int32),
        }
        tx, _ = build_optimizer("SGD", 1e-2, steps_per_epoch=1)
        key = jax.random.key(7)
        sample = [jnp.asarray(batch_d["MRI"][..., None]),
                  jnp.asarray(batch_d["PET"][..., None])]

        # single device, kernels on
        model1 = build_model(model_name, **mk)
        state1 = create_state(model1, tx, sample, jax.random.key(0))
        step1 = make_train_step(("MRI", "PET"), adversarial, aug_cfg,
                                donate=False)
        s1, aux1 = step1(state1, {k: jnp.asarray(v) for k, v in batch_d.items()},
                         key)

        # sharded: shard_map manual over 'data', auto 'model' axis
        axes = ({"data": n_data, "model": 8 // n_data} if model_parallel
                else {"data": n_data})
        mesh = make_mesh(axes)
        model2 = build_model(model_name, axis_name="data", **mk)
        state2 = create_state(model2, tx, sample, jax.random.key(0))
        state2 = shard_state(state2, mesh)
        bs = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, bs) for k, v in batch_d.items()}
        step2 = make_train_step(("MRI", "PET"), adversarial, aug_cfg,
                                donate=False, mesh=mesh)
        s2, aux2 = step2(state2, dev_batch,
                         jax.device_put(key, replicated(mesh)))
        return (s1, aux1), (s2, aux2)

    @pytest.mark.slow
    def test_cnn_ad_kernels_sharded_matches_single(self, rng):
        """Stem conv+stats, fused affine-act-pool, avg pool, ManualBN psum,
        GRL and the SGD update — sharded grads/stats must equal the
        single-device run (reduction-order tolerance only)."""
        (s1, aux1), (s2, aux2) = self._run_pair(rng, "cnn_ad", {})
        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                        jax.tree_util.tree_leaves(s2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_ad_flagship_kernels_sharded_matches_single(self, rng):
        """The flagship ModelAd path: adds fused attention and the fused
        GAP/GMP token pool on top of the sNet kernels (head_dropout=0 so
        the comparison is deterministic)."""
        (s1, aux1), (s2, aux2) = self._run_pair(
            rng, "ad", dict(depth=1, heads=2, head_dropout=0.0),
            batch=4, shape=(16, 16, 16), n_data=2, model_parallel=False)
        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(aux1["logits"]),
                                   np.asarray(aux2["logits"]),
                                   atol=1e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                        jax.tree_util.tree_leaves(s2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_band_conv_kernels_sharded_matches_single(self, rng,
                                                      monkeypatch):
        """Banded body convs (ops/band_conv.py, the full-res routing)
        composed with shard_map: fwd, flipped-band dx, banded-T dw and
        the reduce_ct psum on the replicated weights must all give
        sharded grads/stats equal to the single-device run."""
        monkeypatch.setenv("TRANSMF_BAND_CONV", "all")
        (s1, aux1), (s2, aux2) = self._run_pair(
            rng, "cnn_ad", {}, batch=4, shape=(16, 16, 16), n_data=2,
            model_parallel=False)
        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                        jax.tree_util.tree_leaves(s2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("regime", ["blocked", "xla_fwd"])
    def test_over_vmem_regime_sharded_matches_single(self, rng, monkeypatch,
                                                     regime):
        """The full-resolution routing (over-stem_fits geometry) composed
        with shard_map, in BOTH regimes — the default z-blocked banded fwd
        and the kill-switch XLA fwd (+ z-blocked banded dw) that sliver
        chunk shapes take: sharded grads/stats must equal the
        single-device run."""
        from transmf_ad_tpu.ops.stem import stem_fits

        if regime == "xla_fwd":
            monkeypatch.setenv("TRANSMF_NO_BLOCKED_STEM", "1")
        assert not stem_fits((8, 8, 384), 8)  # dim=32 -> stem C=8
        (s1, aux1), (s2, aux2) = self._run_pair(
            rng, "cnn_ad", {}, batch=2, shape=(8, 8, 384), n_data=2,
            model_parallel=False, dim=32)
        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                        jax.tree_util.tree_leaves(s2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_sharded_augmentation_differs_per_shard(self, rng):
        """Each data shard must draw independent augmentations (the rng is
        folded with axis_index); identical per-shard draws would correlate
        the augmented batch across devices."""
        from transmf_ad_tpu.data.transforms import AugmentConfig

        (_, aux1), (_, aux2) = self._run_pair(
            rng, "cnn_ad", {}, aug_cfg=AugmentConfig(),
            n_data=4, model_parallel=False)
        # same data, same seed: sharded vs single augmentation draws differ,
        # so the losses should NOT be bitwise equal (they stay close)
        assert float(aux1["loss"]) != float(aux2["loss"])

    def test_eval_step_sharded_matches_single(self, rng):
        from transmf_ad_tpu.train.metrics import MetricState
        from transmf_ad_tpu.train.steps import make_eval_step

        batch, shape = 8, (16, 16, 16)
        batch_d = {
            "MRI": rng.standard_normal((batch, *shape)).astype(np.float32),
            "PET": rng.standard_normal((batch, *shape)).astype(np.float32),
            "label": rng.integers(0, 2, batch).astype(np.int32),
            "mask": np.concatenate([np.ones(6, np.float32),
                                    np.zeros(2, np.float32)]),
        }
        tx, _ = build_optimizer("SGD", 1e-2, steps_per_epoch=1)
        sample = [jnp.asarray(batch_d["MRI"][..., None]),
                  jnp.asarray(batch_d["PET"][..., None])]
        model = build_model("cnn_ad", dim=8, use_pallas=True)
        state = create_state(model, tx, sample, jax.random.key(0))

        e1 = make_eval_step(("MRI", "PET"), True)
        ms1, out1 = e1(state, MetricState.zero(),
                       {k: jnp.asarray(v) for k, v in batch_d.items()})

        mesh = make_mesh({"data": 4})
        state_sh = shard_state(state, mesh)
        bs = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, bs) for k, v in batch_d.items()}
        e2 = make_eval_step(("MRI", "PET"), True, mesh=mesh)
        ms2, out2 = e2(state_sh, MetricState.zero(), dev_batch)

        for f in ("correct", "total", "loss_sum", "batches"):
            np.testing.assert_allclose(float(getattr(ms1, f)),
                                       float(getattr(ms2, f)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ms1.confusion),
                                   np.asarray(ms2.confusion))
        np.testing.assert_allclose(np.asarray(out1["probs"]),
                                   np.asarray(out2["probs"]),
                                   atol=1e-6, rtol=1e-5)

    @pytest.mark.slow
    def test_flash_attention_under_shard_map(self, rng):
        """The long-sequence flash kernel (fwd + its two Pallas bwd
        kernels) composes with a manual data axis: batch rows are
        independent, so per-shard results must equal unsharded exactly
        (same kernel, same per-row blocks)."""
        from jax.sharding import PartitionSpec as P

        from transmf_ad_tpu.ops.flash_attention import flash_attention

        b, h, n, d = 8, 2, 320, 32
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        scale = d**-0.5

        def att(q, k, v):
            return flash_attention(q, k, v, scale, 128, 128, True)

        mesh = make_mesh({"data": 4})
        sharded = jax.shard_map(
            att, mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P("data"),
            check_vma=False)

        def loss(f, q, k, v):
            return jnp.sum(f(q, k, v) ** 2)

        l1, g1 = jax.value_and_grad(loss, argnums=(1, 2, 3))(att, q, k, v)
        l2, g2 = jax.value_and_grad(loss, argnums=(1, 2, 3))(sharded, q, k, v)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b_, name in zip(g1, g2, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-6, rtol=1e-5, err_msg=name)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.eval_shape(fn, *args)  # abstract compile-path check
        assert out.shape == (2, 2)

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    @pytest.mark.slow
    @pytest.mark.parametrize("n,model_axis", [
        (16, 2),   # data=8  x model=2
        (16, 4),   # data=4  x model=4
        (32, 2),   # data=16 x model=2
    ])
    def test_dryrun_scales_past_eight_devices(self, n, model_axis):
        """The sharded train step compiles + executes on virtual meshes
        beyond the 8-device default, across data x model combinations
        (clean subprocess: this test process is pinned to 8 devices)."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["TRANSMF_DRYRUN_MODEL"] = str(model_axis)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "__graft_entry__.py"),
             "dryrun", str(n)],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900)
        assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
        assert "dryrun_multichip ok" in out.stdout
        assert f"'model': {model_axis}" in out.stdout

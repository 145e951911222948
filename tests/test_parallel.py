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


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.eval_shape(fn, *args)  # abstract compile-path check
        assert out.shape == (2, 2)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

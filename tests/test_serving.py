"""Serving export: StableHLO artifact roundtrip on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.serving import (
    export_inference,
    load_inference,
    make_inference_fn,
    make_sharded_inference_fn,
)
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state


def _state(rng, shape=(16, 16, 16)):
    model = build_model("cnn_ad", dim=8)
    tx, _ = build_optimizer("Adam", 1e-3, steps_per_epoch=1)
    mri = jnp.asarray(rng.standard_normal((2, *shape, 1)), jnp.float32)
    return create_state(model, tx, [mri, mri], jax.random.key(0)), shape


class TestServing:
    def test_export_roundtrip(self, rng, tmp_path):
        state, shape = _state(rng)
        path = str(tmp_path / "model.stablehlo")
        export_inference(state, ("MRI", "PET"), True, path, shape,
                         batch_size=2)
        fn = load_inference(path)

        mri = rng.standard_normal((2, *shape)).astype(np.float32)
        pet = rng.standard_normal((2, *shape)).astype(np.float32)
        probs = np.asarray(fn(mri, pet))
        assert probs.shape == (2, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

        # matches the live inference function
        live = make_inference_fn(state, ("MRI", "PET"), True)
        expected = np.asarray(live(jnp.asarray(mri), jnp.asarray(pet)))
        np.testing.assert_allclose(probs, expected, atol=1e-5)

    def test_polymorphic_batch(self, rng, tmp_path):
        """Default export carries a SYMBOLIC batch dim: one artifact
        serves any batch size, and each matches the live forward."""
        state, shape = _state(rng)
        path = str(tmp_path / "model_poly.stablehlo")
        export_inference(state, ("MRI", "PET"), True, path, shape)
        fn = load_inference(path)
        live = make_inference_fn(state, ("MRI", "PET"), True)
        for b in (1, 3, 5):
            mri = rng.standard_normal((b, *shape)).astype(np.float32)
            pet = rng.standard_normal((b, *shape)).astype(np.float32)
            probs = np.asarray(fn(mri, pet))
            assert probs.shape == (b, 2)
            expected = np.asarray(live(jnp.asarray(mri), jnp.asarray(pet)))
            np.testing.assert_allclose(probs, expected, atol=1e-5)

    def test_single_modality_export(self, rng, tmp_path):
        """Non-adversarial single-modality model exports and serves."""
        model = build_model("single", dim=8)
        tx, _ = build_optimizer("Adam", 1e-3, steps_per_epoch=1)
        shape = (16, 16, 16)
        mri = jnp.asarray(rng.standard_normal((2, *shape, 1)), jnp.float32)
        state = create_state(model, tx, [mri], jax.random.key(0))
        path = str(tmp_path / "single.stablehlo")
        export_inference(state, ("MRI",), False, path, shape, batch_size=2)
        fn = load_inference(path)
        x = rng.standard_normal((2, *shape)).astype(np.float32)
        probs = np.asarray(fn(x))
        assert probs.shape == (2, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_sharded_matches_single_device(self, rng):
        """Batch-sharded SPMD inference over a data-parallel mesh returns
        the same probabilities as the single-device forward, with the
        output sharded over the data axis."""
        import pytest

        from transmf_ad_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        state, shape = _state(rng)
        mesh = make_mesh({"data": 8})
        fn = make_sharded_inference_fn(state, ("MRI", "PET"), True, mesh)
        live = make_inference_fn(state, ("MRI", "PET"), True)
        mri = jnp.asarray(rng.standard_normal((8, *shape)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((8, *shape)), jnp.float32)
        probs = fn(mri, pet)
        assert probs.shape == (8, 2)
        assert len(probs.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(probs),
                                   np.asarray(live(mri, pet)), atol=1e-5)

    def test_sharded_data_x_model_mesh(self, rng):
        """data=4 x model=2 mesh: tensor-parallel param placement composes
        with the batch-sharded serving path (XLA inserts the collectives)
        and still matches the single-device result."""
        import pytest

        from transmf_ad_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        state, shape = _state(rng)
        mesh = make_mesh({"data": 4, "model": 2})
        fn = make_sharded_inference_fn(state, ("MRI", "PET"), True, mesh)
        live = make_inference_fn(state, ("MRI", "PET"), True)
        mri = jnp.asarray(rng.standard_normal((4, *shape)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((4, *shape)), jnp.float32)
        probs = fn(mri, pet)
        assert probs.shape == (4, 2)
        np.testing.assert_allclose(np.asarray(probs),
                                   np.asarray(live(mri, pet)), atol=1e-5)

    def test_artifact_matches_trained_checkpoint(self, rng, tmp_path):
        """Export -> restore-from-checkpoint -> export again produces the
        same probabilities: the artifact is a faithful function of the
        SAVED weights, not of transient state."""
        from transmf_ad_tpu.train import checkpoint as ckpt

        state, shape = _state(rng)
        # persist and reload weights the way the trainer does
        saveable = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt.save_latest(str(tmp_path), saveable)
        restored = ckpt.load(str(tmp_path / "latest.msgpack"), saveable)
        state2 = state.replace(params=restored["params"],
                               batch_stats=restored["batch_stats"])

        p1 = str(tmp_path / "a.stablehlo")
        p2 = str(tmp_path / "b.stablehlo")
        export_inference(state, ("MRI", "PET"), True, p1, shape, batch_size=2)
        export_inference(state2, ("MRI", "PET"), True, p2, shape,
                         batch_size=2)
        mri = rng.standard_normal((2, *shape)).astype(np.float32)
        pet = rng.standard_normal((2, *shape)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(load_inference(p1)(mri, pet)),
            np.asarray(load_inference(p2)(mri, pet)), atol=1e-6)

"""Serving export: StableHLO artifact roundtrip on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.serving import (
    export_inference,
    load_inference,
    make_inference_fn,
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

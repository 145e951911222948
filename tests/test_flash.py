"""KV-blocked online-softmax flash attention (ops/flash_attention.py).

Parity of the Pallas flash kernel (interpret mode on CPU) against the
plain-XLA reference at long sequence lengths — the resolution-scaling
path (reference analogue: models/networks.py:141-175 attention semantics;
the reference never exceeds 150 tokens, the flash kernel exists so
full-resolution 182^3 grids and finer patchings stay VMEM-resident).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    fused_attention,
)


def _mk(rng, b, h, n, m, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, m, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, m, d)), dtype)
    return q, k, v


class TestFlashAttention:
    def test_forward_parity_4k_tokens(self, rng):
        # > 4k tokens, unaligned to the 512 blocks: exercises the online
        # recurrence across 9 KV blocks plus key-padding masks
        q, k, v = _mk(rng, 1, 2, 4104, 4104, 64)
        scale = 64**-0.5
        out = flash_attention(q, k, v, scale, 512, 512, True)
        ref = attention_reference(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_forward_cross_attention_unaligned(self, rng):
        # n != m, head dim 48 (lane-pads to 128), sizes not multiples of 8
        q, k, v = _mk(rng, 2, 2, 1573, 777, 48)
        scale = 48**-0.5
        out = flash_attention(q, k, v, scale, 256, 256, True)
        ref = attention_reference(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_forward_single_kv_block(self, rng):
        # m smaller than one KV block: degenerates to the single-pass case
        q, k, v = _mk(rng, 1, 3, 300, 100, 32)
        out = flash_attention(q, k, v, 32**-0.5, 128, 128, True)
        ref = attention_reference(q, k, v, 32**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_grad_parity_4k_tokens(self, rng):
        q, k, v = _mk(rng, 1, 2, 4104, 4104, 64)
        scale = 64**-0.5
        g = jnp.asarray(
            rng.standard_normal((1, 2, 4104, 64)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.vdot(flash_attention(q, k, v, scale, 512, 512, True),
                            g)

        def loss_ref(q, k, v):
            return jnp.vdot(attention_reference(q, k, v, scale), g)

        dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=name)

    def test_grad_parity_cross_unaligned(self, rng):
        q, k, v = _mk(rng, 1, 2, 700, 1100, 48)
        scale = 48**-0.5
        g = jnp.asarray(rng.standard_normal((1, 2, 700, 48)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.vdot(flash_attention(q, k, v, scale, 256, 256, True),
                            g)

        def loss_ref(q, k, v):
            return jnp.vdot(attention_reference(q, k, v, scale), g)

        for a, b, name in zip(
            jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v),
            jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
            ("dq", "dk", "dv"),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=name)

    def test_matches_single_pass_kernel(self, rng):
        # both Pallas kernels agree with each other on a mid-size problem
        q, k, v = _mk(rng, 1, 2, 640, 640, 64)
        scale = 64**-0.5
        a = flash_attention(q, k, v, scale, 256, 256, True)
        b = fused_attention(q, k, v, scale, True)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_attention_core_routes_long_sequences(self, rng):
        from transmf_ad_tpu.ops import FLASH_MIN_KEYS, attention_core

        n = FLASH_MIN_KEYS + 8
        q, k, v = _mk(rng, 1, 1, 64, n, 32)
        out = attention_core(q, k, v, 32**-0.5, use_pallas=True)
        ref = attention_reference(q, k, v, 32**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_bf16_storage_f32_compute(self, rng):
        q, k, v = _mk(rng, 1, 2, 2600, 2600, 64, jnp.bfloat16)
        scale = 64**-0.5
        out = flash_attention(q, k, v, scale, 512, 512, True)
        assert out.dtype == jnp.bfloat16
        ref = attention_reference(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

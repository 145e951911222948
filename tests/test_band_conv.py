"""Banded body-conv kernel (ops/band_conv.py) vs the XLA conv oracle.

Covers the three z-chunk regimes (single block, divisor chunks,
clipped tail), both grad paths (banded dx via the flipped band, banded
dw via the T diagonals), and the ConvBNAct/SNet routing behind
TRANSMF_BAND_CONV. Interpret mode on the CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu.ops.band_conv import (band_conv3d, band_conv_fits,
                                          pick_tz_body)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# (B, X, Y, Z, Cin, Cout): single-block, divisor-chunk, clipped-tail
SHAPES = [
    (2, 5, 6, 7, 3, 8),     # tz == Z (single block, odd everything)
    (1, 4, 9, 16, 8, 16),   # tz 8 divides Z
    (2, 3, 5, 13, 4, 32),   # tz 4, Zo 16 != 13 (clipped tail)
]


class TestBandConv:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_forward_matches_xla(self, rng, shape):
        B, X, Y, Z, ci, co = shape
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                        jnp.float32)
        y = band_conv3d(x, w, True, True)
        y_ref = band_conv3d(x, w, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("shape", SHAPES)
    def test_grads_match_xla(self, rng, shape):
        B, X, Y, Z, ci, co = shape
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                        jnp.float32)

        def loss(use_pallas):
            def f(x, w):
                return jnp.sum(jnp.sin(band_conv3d(x, w, use_pallas, True)))
            return f

        gx, gw = jax.grad(loss(True), argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(loss(False), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("shape", SHAPES)
    def test_stats_variant_matches_xla(self, rng, shape):
        """band_conv3d_stats: y, per-lane Σ/Σ², and the ab-fused backward
        (stats cotangents flowing through dw and the dx yhat assembly)
        against the XLA oracle."""
        from transmf_ad_tpu.ops.band_conv import band_conv3d_stats

        B, X, Y, Z, ci, co = shape
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                        jnp.float32)
        (y, st) = band_conv3d_stats(x, w, True, True)
        (y_r, st_r) = band_conv3d_stats(x, w, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st), np.asarray(st_r),
                                   atol=1e-3, rtol=1e-4)

        def loss(use_pallas):
            def f(x, w):
                y, st = band_conv3d_stats(x, w, use_pallas, True)
                return (jnp.sum(jnp.sin(y)) + jnp.sum(st[0] * 0.3)
                        + jnp.sum(st[1] * 0.1))
            return f

        gx, gw = jax.grad(loss(True), argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(loss(False), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   atol=5e-4, rtol=1e-3)

    def test_bf16_forward_close(self, rng):
        B, X, Y, Z, ci, co = 2, 4, 6, 8, 4, 16
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                        jnp.bfloat16)
        y = band_conv3d(x, w, True, True).astype(jnp.float32)
        y_ref = band_conv3d(x, w, False).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=5e-2, rtol=5e-2)

    def test_pick_tz_alignment(self):
        # tz*Cout must be a multiple of 128 whenever tz < Z
        for Z, co in [(91, 64), (45, 64), (91, 128), (45, 128), (23, 256)]:
            tz = pick_tz_body(Z, co)
            if tz < Z:
                assert (tz * co) % 128 == 0, (Z, co, tz)
        assert pick_tz_body(7, 8) == 7  # quantum covers the axis

    def test_fits_gate(self):
        # reference full-res s2 geometries fit; absurd ones do not
        assert band_conv_fits((91, 109, 91), 32, 64, 4)
        assert band_conv_fits((91, 109, 91), 64, 64, 4)
        assert band_conv_fits((45, 54, 45), 32, 64, 8)
        assert not band_conv_fits((91, 109, 91), 512, 512, 32)


class TestBandConvRouting:
    """TRANSMF_BAND_CONV routes SNet body convs through the banded kernel
    with identical results (merged-layout pool path included)."""

    @pytest.mark.slow
    def test_snet_band_on_matches_off(self, rng, monkeypatch):
        from transmf_ad_tpu.nn.blocks import SNet

        x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 1)), jnp.float32)

        def run(band):
            # 'all' ignores the production voxel threshold (test shapes
            # are far below the 400k-voxel band gate)
            monkeypatch.setenv("TRANSMF_BAND_CONV", "all" if band else "0")
            m = SNet(dim=16, use_pallas=band or None)
            v = m.init(jax.random.key(0), x, True)

            def loss(p):
                y, upd = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x, True,
                    mutable=["batch_stats"])
                return jnp.sum(y ** 2), upd

            (l, upd), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
            return l, g, upd

        l1, g1, u1 = run(True)
        l0, g0, u0 = run(False)
        assert abs(float(l1) - float(l0)) < 1e-4
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(u1),
                        jax.tree_util.tree_leaves(u0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_band_off_below_threshold_by_default(self, rng, monkeypatch):
        """Default mode is ON but gated to >= 400k-voxel stages; small
        (crop-class and test) shapes never route through the band kernel
        (the crop-res full-step A/B LOSES when forced — PERFORMANCE.md)."""
        monkeypatch.delenv("TRANSMF_BAND_CONV", raising=False)
        from transmf_ad_tpu.nn import blocks as blocks_mod

        calls = []
        import transmf_ad_tpu.ops.band_conv as bc

        orig = bc.band_conv3d
        monkeypatch.setattr(bc, "band_conv3d",
                            lambda *a, **k: calls.append(1) or orig(*a, **k))
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)), jnp.float32)
        m = blocks_mod.SNet(dim=8)
        m.init(jax.random.key(0), x, True)
        assert not calls

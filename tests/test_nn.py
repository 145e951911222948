"""NN block tests: shapes, torch parity for conv/BN, attention math,
Pallas kernel parity (interpret mode), GRL gradients, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu import nn as tnn
from transmf_ad_tpu.ops.flash_attention import (
    attention_reference,
    fused_attention,
)


class TestSNet:
    def test_output_grid_tiny(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 24, 28, 24, 1)), jnp.float32)
        model = tnn.SNet(dim=16)
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 1, 1, 1, 16)

    def test_output_grid_reference_shape(self):
        # 91x109x91 -> 5x6x5 token grid of width dim (SURVEY C4).
        # Shape-only via eval_shape: no FLOPs, so full dim=128 is checked.
        x = jax.ShapeDtypeStruct((2, 91, 109, 91, 1), jnp.float32)
        model = tnn.SNet(dim=128)
        variables = jax.eval_shape(model.init, jax.random.key(0), x)
        out = jax.eval_shape(model.apply, variables, x)
        assert out.shape == (2, 5, 6, 5, 128)

    def test_train_mode_updates_batch_stats(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 1)), jnp.float32)
        model = tnn.SNet(dim=8)
        variables = model.init(jax.random.key(0), x, train=True)
        out, updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in updates
        leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
        assert np.abs(np.asarray(leaf)).sum() > 0

    @pytest.mark.slow
    @pytest.mark.parametrize("min_mb", ["0", "0.01", "96"])
    def test_selective_remat_matches_no_remat(self, rng, monkeypatch, min_mb):
        """Selective per-block remat (every threshold: all blocks wrapped,
        a mixed prefix wrapped, none wrapped at toy size) must keep the
        param tree IDENTICAL to remat=False (checkpoint portability) and
        produce the same loss gradients."""
        monkeypatch.setenv("TRANSMF_REMAT_MIN_MB", min_mb)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 1)), jnp.float32)

        def grads(net):
            p = net.init(jax.random.key(0), x, True)

            def loss(v):
                y, _ = net.apply(v, x, True, mutable=["batch_stats"])
                return jnp.sum(y**2)

            return p, jax.grad(loss)(
                {"params": p["params"], "batch_stats": p["batch_stats"]})

        p0, g0 = grads(tnn.SNet(dim=16, use_pallas=False, remat=False))
        p1, g1 = grads(tnn.SNet(dim=16, use_pallas=False, remat=True))
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestConvBNTorchParity:
    def test_conv_bn_leaky_matches_torch(self, rng):
        import torch

        b, s, cin, cout = 2, 8, 3, 5
        x = rng.standard_normal((b, s, s, s, cin)).astype(np.float32)
        w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1
        bias = rng.standard_normal((cout,)).astype(np.float32)
        gamma = rng.random(cout).astype(np.float32) + 0.5
        beta = rng.standard_normal((cout,)).astype(np.float32)
        mean = rng.standard_normal((cout,)).astype(np.float32) * 0.1
        var = rng.random(cout).astype(np.float32) + 0.5

        block = tnn.ConvBNAct(cout, precision="highest")
        variables = {
            "params": {
                "kernel": jnp.asarray(w),
                "bias": jnp.asarray(bias),
                "BatchNorm_0": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
            },
            "batch_stats": {
                "BatchNorm_0": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}
            },
        }
        ours = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

        with torch.no_grad():
            tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NDHWC -> NCDHW
            tw = torch.from_numpy(w).permute(4, 3, 0, 1, 2)  # DHWIO -> OIDHW
            y = torch.nn.functional.conv3d(tx, tw, torch.from_numpy(bias), padding=1)
            y = torch.nn.functional.batch_norm(
                y, torch.from_numpy(mean), torch.from_numpy(var),
                torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-5,
            )
            y = torch.nn.functional.leaky_relu(y, 0.01)
            theirs = y.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_batchnorm_masked_matches_torch_bn1d(self, rng):
        """BatchNormMasked must follow torch BatchNorm1d (the reference's
        head BN, reference: mymodel.py:152,190-192): biased batch variance
        for the train-mode output, UNBIASED running_var updates, matching
        eval outputs off the updated running stats; with a 0/1 mask it
        must match torch BN fed the real rows alone. Param tree stays
        nn.BatchNorm-compatible (checkpoints interchange)."""
        import torch
        from flax import linen as nn
        from transmf_ad_tpu.nn.batchnorm import BatchNormMasked

        x = rng.standard_normal((6, 10)).astype(np.float32)
        bn_m = BatchNormMasked(momentum=0.9, epsilon=1e-5)
        vm = bn_m.init(jax.random.key(0), jnp.asarray(x), train=True)
        vr = nn.BatchNorm(use_running_average=False).init(
            jax.random.key(0), jnp.asarray(x))
        assert (jax.tree_util.tree_structure(vr)
                == jax.tree_util.tree_structure(vm))

        tbn = torch.nn.BatchNorm1d(10, eps=1e-5, momentum=0.1)
        tbn.train()
        with torch.no_grad():
            t_out = tbn(torch.from_numpy(x))

        ym, mm = bn_m.apply(vm, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ym), t_out.numpy(), atol=1e-5)
        st = mm["batch_stats"]
        np.testing.assert_allclose(np.asarray(st["mean"]),
                                   tbn.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st["var"]),
                                   tbn.running_var.numpy(), atol=1e-6)

        # eval mode off the updated running stats
        tbn.eval()
        with torch.no_grad():
            t_ev = tbn(torch.from_numpy(x))
        ev_m = bn_m.apply({"params": vm["params"], **mm}, jnp.asarray(x),
                          train=False)
        np.testing.assert_allclose(np.asarray(ev_m), t_ev.numpy(),
                                   atol=1e-5)

        # masked moments == torch BN on the real rows alone
        tbn2 = torch.nn.BatchNorm1d(10, eps=1e-5, momentum=0.1)
        tbn2.train()
        with torch.no_grad():
            t_out2 = tbn2(torch.from_numpy(x[:4]))
        mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
        ym2, mm2 = bn_m.apply(vm, jnp.asarray(x), train=True,
                              mask=mask, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ym2)[:4], t_out2.numpy(),
                                   atol=1e-5)
        st2 = mm2["batch_stats"]
        np.testing.assert_allclose(np.asarray(st2["mean"]),
                                   tbn2.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st2["var"]),
                                   tbn2.running_var.numpy(), atol=1e-6)

    def test_max_avg_pool_floor_semantics(self, rng):
        import torch

        x = rng.standard_normal((1, 7, 9, 7, 2)).astype(np.float32)
        ours_max = np.asarray(tnn.max_pool3d(jnp.asarray(x)))
        ours_avg = np.asarray(tnn.avg_pool3d(jnp.asarray(x)))
        with torch.no_grad():
            tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
            tmax = torch.nn.functional.max_pool3d(tx, 2, 2).permute(0, 2, 3, 4, 1)
            tavg = torch.nn.functional.avg_pool3d(tx, 2, 2).permute(0, 2, 3, 4, 1)
        np.testing.assert_allclose(ours_max, tmax.numpy(), atol=1e-6)
        np.testing.assert_allclose(ours_avg, tavg.numpy(), atol=1e-6)


class TestAttention:
    def _naive(self, x, ctx, p, heads, dim_head):
        """Numpy reference of the reference attention math
        (models/networks.py:157-175)."""
        q = x @ np.asarray(p["to_q"]["kernel"])
        kv = ctx @ np.asarray(p["to_kv"]["kernel"])
        k, v = np.split(kv, 2, axis=-1)
        b, n, _ = q.shape
        m = k.shape[1]

        def heads_split(t, L):
            return t.reshape(b, L, heads, dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_split(q, n), heads_split(k, m), heads_split(v, m)
        s = np.einsum("bhid,bhjd->bhij", qh, kh) * dim_head**-0.5
        s = s - s.max(-1, keepdims=True)
        a = np.exp(s) / np.exp(s).sum(-1, keepdims=True)
        o = np.einsum("bhij,bhjd->bhid", a, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
        return o @ np.asarray(p["to_out"]["kernel"]) + np.asarray(p["to_out"]["bias"])

    def test_self_attention_matches_naive(self, rng):
        dim, heads, dim_head = 16, 4, 8
        x = rng.standard_normal((2, 6, dim)).astype(np.float32)
        attn = tnn.Attention(dim, heads=heads, dim_head=dim_head, use_pallas=False,
                             precision="highest")
        variables = attn.init(jax.random.key(0), jnp.asarray(x))
        out = np.asarray(attn.apply(variables, jnp.asarray(x)))
        ref = self._naive(x, x, variables["params"], heads, dim_head)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_cross_attention_context(self, rng):
        dim = 16
        x = rng.standard_normal((2, 5, dim)).astype(np.float32)
        ctx = rng.standard_normal((2, 9, dim)).astype(np.float32)
        attn = tnn.Attention(dim, heads=2, dim_head=8, use_pallas=False,
                             precision="highest")
        variables = attn.init(jax.random.key(0), jnp.asarray(x), context=jnp.asarray(ctx))
        out = np.asarray(attn.apply(variables, jnp.asarray(x), context=jnp.asarray(ctx)))
        ref = self._naive(x, ctx, variables["params"], 2, 8)
        np.testing.assert_allclose(out, ref, atol=1e-5)
        # kv_include_self concatenates x before context
        out2 = np.asarray(
            attn.apply(variables, jnp.asarray(x), context=jnp.asarray(ctx),
                       kv_include_self=True)
        )
        ref2 = self._naive(x, np.concatenate([x, ctx], axis=1), variables["params"], 2, 8)
        np.testing.assert_allclose(out2, ref2, atol=1e-5)

    def test_pallas_kernel_parity_interpret(self, rng):
        b, h, n, m, d = 2, 4, 150, 150, 32
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        ref = attention_reference(q, k, v, d**-0.5)
        out = fused_attention(q, k, v, d**-0.5, True)  # interpret mode
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_kernel_grad_parity(self, rng):
        b, h, n, m, d = 1, 2, 17, 23, 16
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)

        def loss_pallas(q, k, v):
            return jnp.sum(fused_attention(q, k, v, d**-0.5, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, d**-0.5) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


class TestTransformers:
    def test_transformer_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
        t = tnn.Transformer(16, depth=2, heads=2, dim_head=8, mlp_dim=32,
                            use_pallas=False)
        variables = t.init(jax.random.key(0), x)
        assert t.apply(variables, x).shape == (2, 10, 16)

    def test_cross_transformer_mod_avg_head(self, rng):
        dim = 16
        mri = jnp.asarray(rng.standard_normal((2, 8, dim)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((2, 8, dim)), jnp.float32)
        ct = tnn.CrossTransformerModAvg(dim, depth=2, heads=2, dim_head=8,
                                        mlp_dim=32, use_pallas=False)
        variables = ct.init(jax.random.key(0), mri, pet)
        out = ct.apply(variables, mri, pet)
        assert out.shape == (2, 4 * dim)

    def test_cross_transformer_streams(self, rng):
        dim = 16
        mri = jnp.asarray(rng.standard_normal((2, 8, dim)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((2, 8, dim)), jnp.float32)
        ct = tnn.CrossTransformer(dim, depth=2, heads=2, dim_head=8, mlp_dim=32,
                                  use_pallas=False)
        variables = ct.init(jax.random.key(0), mri, pet)
        m, p = ct.apply(variables, mri, pet)
        assert m.shape == (2, 8, dim) and p.shape == (2, 8, dim)

    def test_cross_transformer_share_ties_weights(self, rng):
        dim = 16
        mri = jnp.asarray(rng.standard_normal((1, 4, dim)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((1, 4, dim)), jnp.float32)
        ct = tnn.CrossTransformer(dim, depth=1, heads=2, dim_head=8, mlp_dim=32,
                                  share=True, use_pallas=False)
        variables = ct.init(jax.random.key(0), mri, pet)
        # shared => exactly one Transformer's params per depth
        assert len(variables["params"]) == 1


class TestGRL:
    def test_identity_forward(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(tnn.revgrad(x, 2.0)), np.asarray(x))

    def test_gradient_reversed_and_scaled(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)

        def f_plain(w):
            return jnp.sum((x @ w) ** 2)

        def f_rev(w):
            return jnp.sum(tnn.revgrad(x @ w, 2.0) ** 2)

        g_plain = jax.grad(f_plain)(w)
        g_rev = jax.grad(f_rev)(w)
        np.testing.assert_allclose(np.asarray(g_rev), -2.0 * np.asarray(g_plain),
                                   atol=1e-5)


class TestLosses:
    def test_cross_entropy_matches_torch(self, rng):
        import torch

        logits = rng.standard_normal((7, 2)).astype(np.float32)
        labels = rng.integers(0, 2, 7).astype(np.int32)
        ours = float(tnn.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        theirs = float(
            torch.nn.functional.cross_entropy(
                torch.from_numpy(logits), torch.from_numpy(labels).long()
            )
        )
        assert abs(ours - theirs) < 1e-6

    def test_weighted_cross_entropy_matches_torch(self, rng):
        import torch

        logits = rng.standard_normal((9, 2)).astype(np.float32)
        labels = rng.integers(0, 2, 9).astype(np.int32)
        w = np.array([0.3, 0.7], np.float32)
        ours = float(
            tnn.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
        )
        theirs = float(
            torch.nn.functional.cross_entropy(
                torch.from_numpy(logits), torch.from_numpy(labels).long(),
                weight=torch.from_numpy(w),
            )
        )
        assert abs(ours - theirs) < 1e-6

    def test_adversarial_loss(self, rng):
        d_mri = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
        d_pet = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
        got = float(tnn.adversarial_loss(d_mri, d_pet))
        want = 0.5 * (
            float(tnn.cross_entropy(d_mri, jnp.ones(4, jnp.int32)))
            + float(tnn.cross_entropy(d_pet, jnp.zeros(4, jnp.int32)))
        )
        assert abs(got - want) < 1e-6

    def test_supcon_degenerates_and_labels(self, rng):
        feats = rng.standard_normal((4, 2, 8)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        labels = np.array([0, 0, 1, 1], np.int32)
        loss = float(tnn.supcon_loss(jnp.asarray(feats), jnp.asarray(labels)))
        assert np.isfinite(loss) and loss > 0
        # Identical positives should yield a lower loss than random ones.
        feats2 = np.repeat(feats[:1], 4, axis=0)
        loss2 = float(
            tnn.supcon_loss(jnp.asarray(feats2), jnp.asarray(np.zeros(4, np.int32)))
        )
        assert loss2 < loss

    def test_fa_loss_zero_for_identical(self, rng):
        fm = jnp.asarray(rng.standard_normal((2, 3, 3, 3, 4)), jnp.float32)
        assert float(tnn.fa_loss(fm, fm)) == 0.0
        fm2 = jnp.asarray(rng.standard_normal((2, 3, 3, 3, 4)), jnp.float32)
        assert float(tnn.fa_loss(fm, fm2)) > 0


class TestStemKernel:
    """Banded-MXU stem conv (ops/stem.py): interpret-mode parity + grads."""

    def test_forward_parity_interpret(self, rng):
        from transmf_ad_tpu.ops.stem import _conv_reference, stem_conv

        x = jnp.asarray(rng.standard_normal((2, 10, 12, 11)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.float32)
        ref = _conv_reference(x, w)
        out = stem_conv(x, w, True, True)  # pallas, interpret
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_grad_parity(self, rng):
        from transmf_ad_tpu.ops.stem import _conv_reference, stem_conv

        x = jnp.asarray(rng.standard_normal((1, 8, 9, 10)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.float32)

        def lp(x, w):
            return jnp.sum(stem_conv(x, w, True, True) ** 2)

        def lr(x, w):
            return jnp.sum(_conv_reference(x, w) ** 2)

        g1 = jax.grad(lp, argnums=(0, 1))(x, w)
        g2 = jax.grad(lr, argnums=(0, 1))(x, w)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)

    def test_stem_fits_vmem_gate(self):
        # reference geometries fit the banded kernels' scoped VMEM;
        # full-resolution volumes must route to the XLA conv fallback
        from transmf_ad_tpu.ops.stem import stem_fits

        assert stem_fits((91, 109, 91), 32)     # flagship
        assert stem_fits((24, 28, 24), 16)      # test fixtures
        assert not stem_fits((182, 218, 182), 32)   # full resolution
        assert not stem_fits((128, 128, 128), 32)   # dw T-band too large

    def test_convbnact_over_budget_shape_falls_back(self, rng):
        # a shape failing stem_fits must run (via XLA conv) and match the
        # explicit XLA path even with use_stem_kernel=True
        from transmf_ad_tpu.ops.stem import stem_fits

        x = jnp.asarray(rng.standard_normal((1, 6, 6, 128, 1)), jnp.float32)
        assert not stem_fits((6, 6, 128), 32)
        blk_k = tnn.ConvBNAct(32, use_stem_kernel=True)
        blk_x = tnn.ConvBNAct(32, use_stem_kernel=False)
        v = blk_k.init(jax.random.key(0), x, True)
        for train in (True, False):
            a, _ = blk_k.apply(v, x, train, mutable=["batch_stats"])
            b, _ = blk_x.apply(v, x, train, mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_convbnact_stem_path_matches_xla_path(self, rng):
        # same params, stem kernel (interpret) vs plain conv path
        from transmf_ad_tpu.ops import stem as stem_mod

        x = jnp.asarray(rng.standard_normal((2, 8, 9, 10, 1)), jnp.float32)
        blk_ref = tnn.ConvBNAct(32, use_stem_kernel=False)
        variables = blk_ref.init(jax.random.key(0), x)
        out_ref = blk_ref.apply(variables, x)

        # route the stem path through interpret-mode pallas on CPU
        orig = stem_mod._stem_pallas
        stem_mod._stem_pallas = lambda x, w, interpret=False: orig(x, w, True)
        try:
            blk_stem = tnn.ConvBNAct(32, use_stem_kernel=True)
            out_stem = blk_stem.apply(variables, x)
        finally:
            stem_mod._stem_pallas = orig
        np.testing.assert_allclose(np.asarray(out_stem), np.asarray(out_ref),
                                   atol=2e-2)


class TestStemXStatsBlockedDw:
    """Full-resolution stem regime (ops/stem.py::stem_conv_xstats): XLA
    conv forward + z-blocked banded-MXU dw backward with fused
    stats-cotangent assembly. Grads must match the plain differentiable
    XLA formulation, including z-chunk counts > 1 and the no-divisor
    (lane-padded) case."""

    @staticmethod
    def _ref(x, w):
        y = jax.lax.conv_general_dilated(
            x[..., None], w[..., None, :], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        yf = y.astype(jnp.float32)
        return y, jnp.stack([jnp.sum(yf, (0, 1, 2, 3)),
                             jnp.sum(jax.lax.square(yf), (0, 1, 2, 3))])

    def test_forward_parity(self, rng):
        from transmf_ad_tpu.ops.stem import stem_conv_xstats

        x = jnp.asarray(rng.standard_normal((2, 5, 6, 40)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1,
                        jnp.float32)
        y, st = stem_conv_xstats(x, w, True, True)
        yr, str_ = self._ref(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st), np.asarray(str_),
                                   rtol=1e-5)

    def test_pick_tz_lane_alignment(self):
        """tz*C must be a multiple of 128 whenever tz < Z: Mosaic rejects
        misaligned lane blocks on real TPU (Z=182's divisor 26 gave an
        832-lane block that failed lowering; interpret mode passed)."""
        from transmf_ad_tpu.ops.stem import _pick_tz

        for Z in (182, 91, 109, 218, 37, 40, 384, 16, 79, 128):
            tz = _pick_tz(Z, 32)
            assert tz == Z or (tz * 32) % 128 == 0, (Z, tz)
        assert _pick_tz(182, 32) == 32  # padded regime, not divisor 26

    @pytest.mark.parametrize("Z", [40, 37])  # divisor chunking / lane pad
    def test_grad_parity_blocked(self, rng, Z):
        from transmf_ad_tpu.ops.stem import _pick_tz, stem_conv_xstats

        C = 32
        tz = _pick_tz(Z, C)
        assert tz < Z  # the test must actually exercise z-blocking
        if Z == 37:  # prime: no non-sliver divisor -> the PADDED regime
            assert tz == 32 and (-(-Z // tz)) * tz != Z
        x = jnp.asarray(rng.standard_normal((2, 5, 6, Z)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, C)) * 0.1,
                        jnp.float32)
        gst = jnp.asarray(rng.standard_normal((2, C)), jnp.float32)

        def lp(x, w):
            y, st = stem_conv_xstats(x, w, True, True)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        def lr(x, w):
            y, st = self._ref(x, w)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        dxp, dwp = jax.grad(lp, argnums=(0, 1))(x, w)
        dxr, dwr = jax.grad(lr, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxr),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_snet_full_res_regime_matches_xla(self, rng, monkeypatch):
        """A whole SNet encoder on an over-VMEM-budget geometry with the
        blocked-stem kill-switch (the XLA-fwd routing: XLA stem conv +
        blocked Pallas dw + bc pool): loss and gradients must match the
        pure-XLA path. (The default blocked-fwd routing is covered by the
        ConvBNAct default/clipped-tail tests and the sharded over-VMEM
        test in test_parallel.py.)"""
        from transmf_ad_tpu.ops.stem import stem_fits

        monkeypatch.setenv("TRANSMF_NO_BLOCKED_STEM", "1")
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 384, 1)), jnp.float32)
        assert not stem_fits((8, 8, 384), 8)
        net_k = tnn.SNet(dim=32, use_pallas=True)
        net_x = tnn.SNet(dim=32, use_pallas=False)
        v = net_k.init(jax.random.key(0), x, True)

        def loss(params, net):
            out, _ = net.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        lk, gk = jax.value_and_grad(loss)(v["params"], net_k)
        lx, gx = jax.value_and_grad(loss)(v["params"], net_x)
        np.testing.assert_allclose(float(lk), float(lx), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)

    def test_blocked_stem_fwd_parity(self, rng):
        """stem_conv_stats_blocked: z-chunked banded fwd + in-kernel
        per-lane stats must match the XLA reference formulation, and its
        custom bwd (blocked dw with per-LANE cotangent assembly) must
        match autodiff of the reference."""
        from transmf_ad_tpu.ops.stem import (_pick_tz, stem_can_block,
                                             stem_conv_stats_blocked)

        Z, C = 40, 32
        assert stem_can_block(Z, C) and _pick_tz(Z, C) == 20
        x = jnp.asarray(rng.standard_normal((2, 5, 6, Z)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, C)) * 0.1,
                        jnp.float32)
        y, st = stem_conv_stats_blocked(x, w, True, True)
        yr, str_ = TestStemXStatsBlockedDw._ref_lane(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)
        # f32 accumulation order differs (per-row in-kernel vs one reduce)
        np.testing.assert_allclose(np.asarray(st), np.asarray(str_),
                                   rtol=1e-3, atol=1e-2)

        gst = jnp.asarray(rng.standard_normal((2, Z * C)) * 0.1, jnp.float32)

        def lp(x, w):
            y, st = stem_conv_stats_blocked(x, w, True, True)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        def lr(x, w):
            y, st = TestStemXStatsBlockedDw._ref_lane(x, w)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        dxp, dwp = jax.grad(lp, argnums=(0, 1))(x, w)
        dxr, dwr = jax.grad(lr, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxr),
                                   rtol=1e-4, atol=1e-4)

    def test_blocked_stem_clipped_tail_parity(self, rng):
        """Clipped-tail regime: non-divisor Z (44 with 128-aligned tz=32)
        zero-pads z_in to nzb*tz; the tail block's phantom output/stat
        lanes are dropped by Pallas on write. fwd + custom bwd must match
        the XLA reference exactly like the divisor regime."""
        from transmf_ad_tpu.ops.stem import (_pick_tz, stem_can_block,
                                             stem_conv_stats_blocked)

        Z, C = 44, 32
        tz = _pick_tz(Z, C)
        assert stem_can_block(Z, C) and Z % tz != 0  # the clipped regime
        x = jnp.asarray(rng.standard_normal((2, 5, 6, Z)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, C)) * 0.1,
                        jnp.float32)
        y, st = stem_conv_stats_blocked(x, w, True, True)
        yr, str_ = TestStemXStatsBlockedDw._ref_lane(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st), np.asarray(str_),
                                   rtol=1e-3, atol=1e-2)

        gst = jnp.asarray(rng.standard_normal((2, Z * C)) * 0.1, jnp.float32)

        def lp(x, w):
            y, st = stem_conv_stats_blocked(x, w, True, True)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        def lr(x, w):
            y, st = TestStemXStatsBlockedDw._ref_lane(x, w)
            return jnp.sum(y ** 2) + jnp.vdot(st, gst)

        dxp, dwp = jax.grad(lp, argnums=(0, 1))(x, w)
        dxr, dwr = jax.grad(lr, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwr),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxr),
                                   rtol=1e-4, atol=1e-4)

    def test_convbnact_blocked_stem_default_matches_xla(self, rng):
        """ConvBNAct on an over-budget shape takes the banded blocked fwd
        + merged pool BY DEFAULT and matches use_stem_kernel=False."""
        from transmf_ad_tpu.ops.stem import stem_can_block, stem_fits

        x = jnp.asarray(rng.standard_normal((1, 6, 6, 384, 1)), jnp.float32)
        assert not stem_fits((6, 6, 384), 8) and stem_can_block(384, 8)
        blk_k = tnn.ConvBNAct(8, pool="max", use_stem_kernel=True)
        blk_x = tnn.ConvBNAct(8, pool="max", use_stem_kernel=False)
        v = blk_k.init(jax.random.key(0), x, True)

        def loss(params, blk):
            out, _ = blk.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        lk, gk = jax.value_and_grad(loss)(v["params"], blk_k)
        lx, gx = jax.value_and_grad(loss)(v["params"], blk_x)
        np.testing.assert_allclose(float(lk), float(lx), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_convbnact_blocked_stem_clipped_tail_matches_xla(self, rng):
        """ConvBNAct routing through the CLIPPED-TAIL blocked regime
        (over-VMEM Z=399 has no 128-aligned divisor chunk -> tz=128,
        Zo=512) matches use_stem_kernel=False end to end."""
        from transmf_ad_tpu.ops.stem import (_pick_tz, stem_can_block,
                                             stem_fits)

        x = jnp.asarray(rng.standard_normal((1, 6, 6, 399, 1)), jnp.float32)
        assert (not stem_fits((6, 6, 399), 8) and stem_can_block(399, 8)
                and 399 % _pick_tz(399, 8) != 0)
        blk_k = tnn.ConvBNAct(8, pool="max", use_stem_kernel=True)
        blk_x = tnn.ConvBNAct(8, pool="max", use_stem_kernel=False)
        v = blk_k.init(jax.random.key(0), x, True)

        def loss(params, blk):
            out, _ = blk.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        lk, gk = jax.value_and_grad(loss)(v["params"], blk_k)
        lx, gx = jax.value_and_grad(loss)(v["params"], blk_x)
        np.testing.assert_allclose(float(lk), float(lx), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)

    @staticmethod
    def _ref_lane(x, w):
        y = jax.lax.conv_general_dilated(
            x[..., None], w[..., None, :], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        b, X, Y, Z, C = y.shape
        yf = y.astype(jnp.float32).reshape(b, X, Y, Z * C)
        return y, jnp.stack([jnp.sum(yf, (0, 1, 2)),
                             jnp.sum(jax.lax.square(yf), (0, 1, 2))])

    def test_convbnact_full_res_regime_matches_xla(self, rng, monkeypatch):
        """A ConvBNAct whose shape fails stem_fits, trained one step with
        use_stem_kernel=True and the blocked-stem kill-switch (-> XLA fwd
        + blocked Pallas dw), must produce the same loss and parameter
        gradients as use_stem_kernel=False."""
        from transmf_ad_tpu.ops.stem import stem_fits

        monkeypatch.setenv("TRANSMF_NO_BLOCKED_STEM", "1")
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 128, 1)), jnp.float32)
        assert not stem_fits((6, 6, 128), 32)
        blk_k = tnn.ConvBNAct(32, use_stem_kernel=True)
        blk_x = tnn.ConvBNAct(32, use_stem_kernel=False)
        v = blk_k.init(jax.random.key(0), x, True)

        def loss(params, blk):
            out, _ = blk.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        lk, gk = jax.value_and_grad(loss)(v["params"], blk_k)
        lx, gx = jax.value_and_grad(loss)(v["params"], blk_x)
        np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


class TestFusedTokenPool:
    def test_parity_interpret(self, rng):
        from transmf_ad_tpu.ops.pooling import fused_token_pool, pool_reference

        mri = jnp.asarray(rng.standard_normal((2, 150, 32)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((2, 150, 32)), jnp.float32)
        ref = pool_reference(mri, pet)
        out = fused_token_pool(mri, pet, True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grad_parity(self, rng):
        from transmf_ad_tpu.ops.pooling import fused_token_pool, pool_reference

        mri = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        pet = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)

        def lp(m, p):
            return jnp.sum(fused_token_pool(m, p, True, True) ** 2)

        def lr(m, p):
            return jnp.sum(pool_reference(m, p) ** 2)

        g1 = jax.grad(lp, argnums=(0, 1))(mri, pet)
        g2 = jax.grad(lr, argnums=(0, 1))(mri, pet)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestPool3D:
    """Pallas 2x2x2 pool kernels (ops/pool3d.py): interpret-mode parity
    with XLA reduce-window (torch MaxPool3d/AvgPool3d(2,2) semantics) and
    gradient parity on tie-free data."""

    SHAPES = [(2, 9, 11, 9, 4), (1, 8, 8, 8, 3), (2, 5, 7, 9, 2),
              (1, 13, 11, 13, 8)]

    def test_max_forward_parity(self, rng):
        from flax import linen as fnn

        from transmf_ad_tpu.ops.pool3d import max_pool3d_2x2

        for shape in self.SHAPES:
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            ref = fnn.max_pool(x, (2, 2, 2), strides=(2, 2, 2),
                               padding="VALID")
            out = max_pool3d_2x2(x, None, True)  # interpret-mode pallas
            assert out.shape == ref.shape
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_max_grad_parity(self, rng):
        from flax import linen as fnn

        from transmf_ad_tpu.ops.pool3d import max_pool3d_2x2

        x = jnp.asarray(rng.standard_normal((2, 9, 11, 9, 4)), jnp.float32)

        def lp(v):
            return jnp.sum(jnp.sin(max_pool3d_2x2(v, None, True) * 3))

        def lr(v):
            return jnp.sum(jnp.sin(fnn.max_pool(
                v, (2, 2, 2), strides=(2, 2, 2), padding="VALID") * 3))

        np.testing.assert_allclose(np.asarray(jax.grad(lp)(x)),
                                   np.asarray(jax.grad(lr)(x)), atol=1e-6)

    def test_max_grad_tie_splitting(self):
        # constant input: every window is an 8-way tie; the kernel splits
        # the gradient equally (sum preserved), never NaN/double-counted
        from transmf_ad_tpu.ops.pool3d import max_pool3d_2x2

        x = jnp.ones((1, 4, 4, 4, 1), jnp.float32)
        g = jax.grad(lambda v: jnp.sum(max_pool3d_2x2(v, None, True)))(x)
        assert float(jnp.sum(g)) == pytest.approx(8.0)
        assert float(jnp.max(g)) == pytest.approx(0.125)

    def test_avg_forward_and_grad_parity(self, rng):
        from flax import linen as fnn

        from transmf_ad_tpu.ops.pool3d import avg_pool3d_2x2

        x = jnp.asarray(rng.standard_normal((2, 9, 11, 9, 4)), jnp.float32)
        ref = fnn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="VALID")
        out = avg_pool3d_2x2(x, None, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

        def lp(v):
            return jnp.sum(jnp.sin(avg_pool3d_2x2(v, None, True) * 3))

        def lr(v):
            return jnp.sum(jnp.sin(fnn.avg_pool(
                v, (2, 2, 2), strides=(2, 2, 2), padding="VALID") * 3))

        np.testing.assert_allclose(np.asarray(jax.grad(lp)(x)),
                                   np.asarray(jax.grad(lr)(x)), atol=1e-6)

    def test_cpu_fallback_is_reduce_window(self, rng):
        # off-TPU (the test mesh) the op must route to XLA reduce-window
        from flax import linen as fnn

        from transmf_ad_tpu.ops.pool3d import avg_pool3d_2x2, max_pool3d_2x2

        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 2)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(max_pool3d_2x2(x)),
            np.asarray(fnn.max_pool(x, (2, 2, 2), strides=(2, 2, 2),
                                    padding="VALID")))
        np.testing.assert_allclose(
            np.asarray(avg_pool3d_2x2(x)),
            np.asarray(fnn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2),
                                    padding="VALID")), atol=1e-6)


class TestStemStats:
    """stem_conv_stats (ops/stem.py): fused Sigma/Sigma^2 epilogue parity."""

    def test_forward_and_stats_parity_interpret(self, rng):
        from transmf_ad_tpu.ops.stem import (_stem_stats_reference,
                                             stem_conv_stats)

        x = jnp.asarray(rng.standard_normal((2, 7, 9, 6)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.2, jnp.float32)
        yr, str_ = _stem_stats_reference(x, w)
        yp, stp = stem_conv_stats(x, w, True, True)  # pallas interpret
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(stp), np.asarray(str_),
                                   rtol=1e-5, atol=1e-4)

    def test_grad_includes_stats_cotangents(self, rng):
        from transmf_ad_tpu.ops.stem import (_stem_stats_reference,
                                             stem_conv_stats)

        x = jnp.asarray(rng.standard_normal((1, 6, 7, 6)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 2)) * 0.2, jnp.float32)

        def loss_custom(x, w):
            y, st = stem_conv_stats(x, w, True, True)
            return jnp.sum(y ** 2) + jnp.sum(jnp.sin(st))

        def loss_ref(x, w):
            y, st = _stem_stats_reference(x, w)
            return jnp.sum(y ** 2) + jnp.sum(jnp.sin(st))

        g1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestBcPoolFused:
    """Conv-native-layout fused affine+act+pool
    (ops/pool3d.py::max_pool3d_2x2_affine_act_bc): parity with the merged
    kernel (identical tie-splitting) and the unfused reference, odd dims
    included. The variant exists to remove full-resolution layout copies at
    XLA-conv-fed stage ends (docs/PERFORMANCE.md round 3)."""

    SHAPES = [(4, 10, 9, 11, 16), (3, 8, 27, 10, 8), (2, 12, 14, 13, 32)]

    @staticmethod
    def _ref(y, s, b, slope=0.01):
        z = y.astype(jnp.float32) * s + b
        z = jnp.where(z >= 0, z, slope * z).astype(y.dtype)
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
            "VALID")

    def test_forward_matches_reference_and_merged(self, rng):
        from transmf_ad_tpu.ops.pool3d import (
            max_pool3d_2x2_affine_act, max_pool3d_2x2_affine_act_bc)

        for shape in self.SHAPES:
            C, Z = shape[-1], shape[-2]
            y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            s = jnp.asarray(rng.standard_normal(C) * 0.5 + 1, jnp.float32)
            b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            out = max_pool3d_2x2_affine_act_bc(y, s, b, 0.01, True, True)
            np.testing.assert_array_equal(
                np.asarray(out, np.float32),
                np.asarray(self._ref(y, s, b), np.float32))
            merged = max_pool3d_2x2_affine_act(
                y, jnp.tile(s, Z), jnp.tile(b, Z), 0.01, True, True)
            np.testing.assert_array_equal(
                np.asarray(out, np.float32), np.asarray(merged, np.float32))

    def test_grad_matches_merged_kernel(self, rng):
        # the merged kernel shares the equal-tie-split subgradient, so dy
        # must agree BITWISE; ds/db agree to f32 accumulation order
        from transmf_ad_tpu.ops.pool3d import (
            max_pool3d_2x2_affine_act, max_pool3d_2x2_affine_act_bc)

        for shape in self.SHAPES:
            C, Z = shape[-1], shape[-2]
            y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            s = jnp.asarray(rng.standard_normal(C) * 0.5 + 1, jnp.float32)
            b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            g = jnp.asarray(rng.standard_normal(
                (shape[0], shape[1] // 2, shape[2] // 2, shape[3] // 2, C)),
                jnp.float32)

            def f_bc(y, s, b):
                out = max_pool3d_2x2_affine_act_bc(y, s, b, 0.01, True, True)
                return jnp.vdot(out.astype(jnp.float32), g)

            def f_m(y, sl, bl):
                out = max_pool3d_2x2_affine_act(y, sl, bl, 0.01, True, True)
                return jnp.vdot(out.astype(jnp.float32), g)

            dy, ds, db = jax.grad(f_bc, argnums=(0, 1, 2))(y, s, b)
            dym, dsl, dbl = jax.grad(f_m, argnums=(0, 1, 2))(
                y, jnp.tile(s, Z), jnp.tile(b, Z))
            np.testing.assert_array_equal(
                np.asarray(dy, np.float32), np.asarray(dym, np.float32))
            np.testing.assert_allclose(
                np.asarray(ds), np.asarray(dsl.reshape(Z, C).sum(0)),
                rtol=2e-2, atol=1e-2)
            np.testing.assert_allclose(
                np.asarray(db), np.asarray(dbl.reshape(Z, C).sum(0)),
                rtol=2e-2, atol=1e-2)

    def test_merged_kernel_lane_chunked_parity(self, rng, monkeypatch):
        """Force the merged affine pool's lane-chunked regime (full-res
        stage-1 shapes where whole-Z*C rows overflow scoped VMEM) and
        check fwd + grads against the XLA reference, odd dims included."""
        import functools as ft

        from transmf_ad_tpu.ops import pool3d

        orig = pool3d._zb_merged

        # real-TPU chunked regime (align=True, the default) must emit a
        # 128-aligned lane block — Mosaic rejects anything else and
        # interpret mode would not catch it (observed at 182^3 on-device)
        zb_full = orig(218, 182, 32, 2)
        assert 1 <= zb_full < 91 and (zb_full * 32) % 128 == 0

        for shape in [(2, 6, 8, 26, 8), (1, 5, 7, 31, 8)]:
            C, Z = shape[-1], shape[-2]
            assert 1 <= orig(shape[2], Z, C, 2, budget=16 * 1024,
                             align=False) < Z // 2
            y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            s = jnp.asarray(rng.standard_normal(Z * C) * 0.5 + 1,
                            jnp.float32)
            b = jnp.asarray(rng.standard_normal(Z * C) * 0.1, jnp.float32)

            def ref(yy, ss, bb):
                z = yy.astype(jnp.float32) * ss.reshape(Z, C) \
                    + bb.reshape(Z, C)
                z = jnp.where(z >= 0, z, 0.01 * z).astype(yy.dtype)
                return jax.lax.reduce_window(
                    z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1),
                    (1, 2, 2, 2, 1), "VALID")

            def f_k(y, s, b):
                o = pool3d.max_pool3d_2x2_affine_act(y, s, b, 0.01, True,
                                                     True)
                return jnp.vdot(o.astype(jnp.float32), g)

            # unchunked run (small shapes fit): the tie-splitting oracle
            out_1 = pool3d.max_pool3d_2x2_affine_act(y, s, b, 0.01, True,
                                                     True)
            g = jnp.asarray(rng.standard_normal(out_1.shape), jnp.float32)
            dy1, ds1, db1 = jax.grad(f_k, argnums=(0, 1, 2))(y, s, b)

            with monkeypatch.context() as m:
                m.setattr(pool3d, "_zb_merged",
                          ft.partial(orig, budget=16 * 1024))
                out_c = pool3d.max_pool3d_2x2_affine_act(y, s, b, 0.01,
                                                         True, True)
                dyc, dsc, dbc = jax.grad(f_k, argnums=(0, 1, 2))(y, s, b)

            # fwd: matches the XLA reference AND the unchunked kernel
            np.testing.assert_array_equal(
                np.asarray(out_c, np.float32),
                np.asarray(ref(y, s, b), np.float32))
            np.testing.assert_array_equal(
                np.asarray(out_c, np.float32), np.asarray(out_1, np.float32))
            # bwd: same algorithm => dy matches the unchunked kernel
            # BITWISE (identical equal-tie splitting); ds/db to f32
            # accumulation order
            assert bool(jnp.all(jnp.isfinite(dyc)))
            np.testing.assert_array_equal(np.asarray(dyc, np.float32),
                                          np.asarray(dy1, np.float32))
            np.testing.assert_allclose(np.asarray(dsc), np.asarray(ds1),
                                       rtol=2e-3, atol=1e-3)
            np.testing.assert_allclose(np.asarray(dbc), np.asarray(db1),
                                       rtol=2e-3, atol=1e-3)

    @pytest.mark.slow
    def test_z_blocked_path_parity(self, rng, monkeypatch):
        """Force the pooled-z blocking (the full-resolution stage-1 route,
        where a single full-Z row set overflows scoped VMEM) by shrinking
        the budget; fwd and grads must still match the XLA reference,
        odd-Z/odd-Y tails included."""
        import functools as ft

        from transmf_ad_tpu.ops import pool3d

        orig = pool3d._yb_zb_for
        monkeypatch.setattr(pool3d, "_yb_zb_for",
                            ft.partial(orig, budget=256 * 1024))
        for shape in [(2, 6, 9, 26, 8), (2, 5, 7, 31, 8), (3, 4, 6, 24, 16)]:
            C = shape[-1]
            # verify the patched plan actually z-blocks (ZB < Zp)
            _, ZB = pool3d._yb_zb_for(shape[2], shape[3], shape[0], C,
                                      live_f32=7)
            assert ZB < shape[3] // 2
            y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            s = jnp.asarray(rng.standard_normal(C) * 0.5 + 1, jnp.float32)
            b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            out = pool3d.max_pool3d_2x2_affine_act_bc(y, s, b, 0.01, True,
                                                      True)
            np.testing.assert_array_equal(
                np.asarray(out, np.float32),
                np.asarray(self._ref(y, s, b), np.float32))
            g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)

            def f_bc(y, s, b):
                o = pool3d.max_pool3d_2x2_affine_act_bc(y, s, b, 0.01,
                                                        True, True)
                return jnp.vdot(o.astype(jnp.float32), g)

            def f_ref(y, s, b):
                return jnp.vdot(self._ref(y, s, b).astype(jnp.float32), g)

            dy, ds, db = jax.grad(f_bc, argnums=(0, 1, 2))(y, s, b)
            dyr, dsr, dbr = jax.grad(f_ref, argnums=(0, 1, 2))(y, s, b)
            assert bool(jnp.all(jnp.isfinite(dy)))
            # reference select-and-scatter routes ties to one element while
            # the kernel splits equally; random bf16 inputs make ties rare
            # enough that dy matches on >99.9% of elements — compare sums
            # (exactly conserved) and ds/db (accumulation-order tolerance)
            np.testing.assert_allclose(float(jnp.sum(dy)),
                                       float(jnp.sum(dyr)), rtol=1e-3)
            np.testing.assert_allclose(np.asarray(ds), np.asarray(dsr),
                                       rtol=2e-2, atol=1e-2)
            np.testing.assert_allclose(np.asarray(db), np.asarray(dbr),
                                       rtol=2e-2, atol=1e-2)

    def test_grad_sum_conservation_on_ties(self):
        # constant input: every window is an 8-way tie; gradient mass must
        # be preserved and split equally, never NaN
        from transmf_ad_tpu.ops.pool3d import max_pool3d_2x2_affine_act_bc

        y = jnp.ones((2, 4, 6, 4, 8), jnp.float32)
        s = jnp.ones((8,), jnp.float32)
        b = jnp.zeros((8,), jnp.float32)
        dy = jax.grad(lambda v: jnp.sum(
            max_pool3d_2x2_affine_act_bc(v, s, b, 0.01, True, True)))(y)
        assert bool(jnp.all(jnp.isfinite(dy)))
        assert float(jnp.sum(dy)) == pytest.approx(2 * 2 * 3 * 2 * 8)
        assert float(jnp.max(dy)) == pytest.approx(0.125)

    def test_convbnact_bc_matches_merged_path(self, rng):
        # full ConvBNAct stage end: bc kernel vs merged kernel via the env
        # A/B knob — same loss, same gradients
        import os

        from transmf_ad_tpu.nn.blocks import ConvBNAct

        x = jnp.asarray(rng.standard_normal((2, 10, 12, 10, 4)), jnp.float32)
        m = ConvBNAct(8, pool="max", use_stem_kernel=True)
        v = m.init(jax.random.key(0), x, True)

        def loss(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        l_bc, g_bc = jax.value_and_grad(loss)(v["params"])
        os.environ["TRANSMF_NO_BC_POOL"] = "1"
        try:
            l_m, g_m = jax.value_and_grad(loss)(v["params"])
        finally:
            os.environ.pop("TRANSMF_NO_BC_POOL", None)
        np.testing.assert_allclose(float(l_bc), float(l_m), rtol=1e-5)
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_bc),
            jax.tree_util.tree_leaves(g_m),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                err_msg=jax.tree_util.keystr(path))



"""3D-CNN building blocks, channels-last (NDHWC) for TPU conv layouts.

TPU-first re-design of the reference encoders (reference: models/networks.py:
18-110). Convs lower to XLA `conv_general_dilated` with NDHWC/DHWIO layouts so
the MXU tiles the contraction; pooling is `lax.reduce_window` with VALID
padding (floor semantics, matching torch MaxPool3d(2,2)). BatchNorm keeps
running stats like torch (momentum 0.1, eps 1e-5); under global-view jit with
a sharded batch axis the mean/var reductions are global automatically, which
is the multi-chip "sync BN" the reference never had.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .init import kaiming_fan_out, torch_conv_bias

Dtype = Any


def _stem_blocked_route(Z, C):
    """Whether an over-VMEM stem takes the z-blocked banded Pallas route
    (the default whenever an aligned chunk size exists;
    TRANSMF_NO_BLOCKED_STEM=1 forces the XLA-conv regime)."""
    from ..ops.stem import stem_can_block
    from ..utils.env import env_flag

    return (not env_flag("TRANSMF_NO_BLOCKED_STEM")
            and stem_can_block(Z, C))


class ConvBNAct(nn.Module):
    """Conv3d(+pad) -> BatchNorm -> activation [-> fused 2x2x2 pool].

    Single-input-channel 3x3x3 stride-1 SAME convs (the sNet stem) route
    through the banded-MXU Pallas kernel on TPU; everything else lowers to
    `conv_general_dilated`. BatchNorm is ManualBN (identical param tree to
    flax BatchNorm: {kernel, bias, BatchNorm_0/{scale,bias}} + batch_stats
    {mean,var}) which returns the per-channel affine; the conv bias folds
    into the affine shift, so the apply+activation is ONE elementwise
    consumer — and when `pool='max'` it fuses into the Pallas pool kernel
    prologue on TPU so the full-resolution activated tensor never exists
    in HBM (ops/pool3d.py::max_pool3d_2x2_affine_act).
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: str = "SAME"
    act: str = "leaky_relu"  # 'leaky_relu' | 'relu' | 'none'
    pool: Optional[str] = None  # None | 'max' | 'avg' (2x2x2 stride 2)
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None  # None = fast (bf16 MXU); 'highest' = f32
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum(0.1)
    axis_name: Optional[str] = None
    use_stem_kernel: Optional[bool] = None  # None => auto (TPU only)
    # (two round-3 kernels that measurably LOST their full-step A/Bs —
    # stage-1 mega-fusion and Pallas body-conv BN-stats — were deleted in
    # round 4; docs/PERFORMANCE.md keeps the write-ups, git keeps the code)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        # bn_mask: optional (B,) 0/1 validity weights for the BN batch
        # moments — real samples only, so duplicate-padded ragged batches
        # (data/pipeline.py::pad_batch) produce the reference's short-batch
        # statistics exactly. When given, producer-kernel stats are
        # discarded in favor of a mask-weighted reduction (ManualBN).
        from ..ops.pool3d import (avg_pool3d_2x2, max_pool3d_2x2,
                                  max_pool3d_2x2_affine_act)
        from ..ops.stem import stem_conv
        from .batchnorm import ManualBN, bn_affine_reference

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_fan_out, (*self.kernel, cin, self.features)
        )
        bias = self.param(
            "bias", torch_conv_bias(cin * int(np.prod(self.kernel))),
            (self.features,),
        )
        dt = self.dtype or x.dtype
        xd, kd = x.astype(dt), kernel.astype(dt)

        from ..ops.stem import stem_fits

        stem_structural = (
            cin == 1
            and self.kernel == (3, 3, 3)
            and self.strides == (1, 1, 1)
            and self.padding == "SAME"
            and self.precision is None
        )
        # full-resolution volumes overflow the banded fwd kernels' scoped
        # VMEM; they take the XLA conv + conv-native-layout pool path, but
        # training still routes the weight gradient through the z-blocked
        # banded dw kernel (ops/stem.py::stem_conv_xstats)
        stem_ok = stem_structural and stem_fits(
            x.shape[1:4], self.features, jnp.dtype(dt).itemsize)
        use_stem = self.use_stem_kernel
        if use_stem is None:
            use_stem = stem_structural and jax.default_backend() == "tpu"
        # linear conv output; the bias folds into the BN affine below
        stats = None
        band_world = False  # banded body conv emitted the merged layout
        if use_stem and stem_ok:
            if train:
                from ..ops.stem import stem_conv_stats

                y, st = stem_conv_stats(xd[..., 0], kd[:, :, :, 0, :])
                Z = y.shape[-2]
                stc = st.reshape(2, Z, self.features).sum(axis=1)
                n = int(np.prod(y.shape[:-1]))
                stats = (stc[0], stc[1], n)
            else:  # eval needs no batch statistics
                y = stem_conv(xd[..., 0], kd[:, :, :, 0, :])
        elif use_stem and stem_structural and (
                train or _stem_blocked_route(x.shape[3], self.features)):
            from ..ops.stem import stem_conv_stats_blocked, stem_conv_xstats

            Z = x.shape[3]
            if _stem_blocked_route(Z, self.features):
                # DEFAULT over-VMEM route: fully-banded z-blocked stem fwd
                # (merged-layout output + in-kernel per-lane stats) instead
                # of the XLA conv — full-res A/B 854.6 -> 334.4 ms/step
                # (docs/PERFORMANCE.md). Changes the stage-end pool to the
                # lane-chunked MERGED kernel (the output layout it wants).
                # EVAL takes it too: the XLA-conv route's channels-minor
                # (X,Y,Z,B,C) pool feed pads C=32 lanes to 128 — a 4x HBM
                # copy (13.8 GB at batch 8 full-res) the merged layout
                # never materializes; the in-kernel stats are simply
                # discarded. TRANSMF_NO_BLOCKED_STEM=1 reverts to the
                # XLA-fwd regime.
                y, st = stem_conv_stats_blocked(xd[..., 0],
                                                kd[:, :, :, 0, :])
                if train:
                    stc = st.reshape(2, Z, self.features).sum(axis=1)
                    n = int(np.prod(y.shape[:-1]))
                    stats = (stc[0], stc[1], n)
                stem_ok = True  # merged-layout stage end (pool routing)
            else:
                # sliver-chunk shapes (huge C) or the kill-switch: XLA
                # conv forward, but the weight gradient + stats-cotangent
                # assembly still run in the z-blocked banded-MXU dw kernel
                # (29 ms/modality of XLA VPU multiply-add otherwise at
                # 182^3 — docs/PERFORMANCE.md)
                y, st2 = stem_conv_xstats(xd[..., 0], kd[:, :, :, 0, :])
                n = int(np.prod(y.shape[:-1]))
                stats = (st2[0], st2[1], n)
        else:
            # Body convs: XLA below the voxel threshold (its TPU 3D convs
            # run at up to 183 TF/s at s3/s4 shapes), the z-blocked
            # banded-MXU kernel above it (ops/band_conv.py, the stem
            # formulation generalized to Cin>1). The round-4 A/B found the
            # split is SPATIAL: at 91^3-class tensors XLA's im2col goes
            # bandwidth-bound (~24 TF/s; banded train wins 1.3-1.7x,
            # full-res step 353.2 -> 294.3 ms), while at 45^3-and-below it
            # runs near the MXU roofline and banded loses (crop step
            # 65.0 -> 77.1 ms when forced everywhere). Default: banded at
            # >= 400k voxels (only full-resolution-class stages qualify).
            # TRANSMF_BAND_CONV: '0' off | '1'/unset auto | 'all' ignores
            # the threshold (A/Bs); TRANSMF_BAND_CONV_MIN_VOX overrides.
            use_band = False
            band_structural = (
                cin > 1
                and self.kernel == (3, 3, 3)
                and self.strides == (1, 1, 1)
                and self.padding == "SAME"
                and self.precision is None
                and self.use_stem_kernel is not False
            )
            if band_structural:
                import os

                from ..ops.band_conv import band_conv_fits
                from ..utils.env import _FALSY

                mode = os.environ.get("TRANSMF_BAND_CONV", "1")
                min_vox = int(os.environ.get(
                    "TRANSMF_BAND_CONV_MIN_VOX", "400000"))
                big = (mode == "all"
                       or int(np.prod(x.shape[1:4])) >= min_vox)
                use_band = (
                    mode not in _FALSY and big
                    and (self.use_stem_kernel
                         or jax.default_backend() == "tpu")
                    and band_conv_fits(x.shape[1:4], cin, self.features,
                                       x.shape[0], jnp.dtype(dt).itemsize))
            if use_band:
                from ..ops.band_conv import band_conv3d, band_conv3d_stats

                if train and bn_mask is None:
                    # in-kernel Σ/Σ² (an XLA stats read of the Pallas
                    # output costs an f32 transposed full-tensor copy
                    # and f32 backward intermediates — band_conv.py)
                    y, st = band_conv3d_stats(xd, kd)
                    Z = y.shape[-2]
                    stc = st.reshape(2, Z, self.features).sum(axis=1)
                    stats = (stc[0], stc[1], int(np.prod(y.shape[:-1])))
                else:
                    y = band_conv3d(xd, kd)
                band_world = True
            else:
                y = jax.lax.conv_general_dilated(
                    xd, kd, self.strides, self.padding,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    precision=self.precision,
                )
            # Body-conv BN stats stay in XLA (`convert_reduce` fusions):
            # the round-3 Pallas replacement LOST ~2.6 ms/step to layout
            # copies and was deleted (docs/PERFORMANCE.md round 3, #2).
            # The banded kernel keeps that too: its merged row-major bf16
            # output reduces lane-preservingly (no layout copy).

        if bn_mask is not None:
            stats = None  # producer-kernel sums cover padded duplicates
        scale, shift = ManualBN(
            momentum=self.bn_momentum, epsilon=1e-5,
            axis_name=self.axis_name, name="BatchNorm_0",
        )(y, conv_bias=bias, train=train, stats=stats, mask=bn_mask)
        slope = {"leaky_relu": 0.01, "relu": 0.0, "none": 1.0}[self.act]

        if self.pool == "max" and y.ndim == 5:
            from ..ops.pool3d import max_pool3d_2x2_affine_act_bc
            from ..utils.env import env_flag

            Z, C = y.shape[-2], y.shape[-1]
            # XLA-conv-fed stage ends use the conv-native-layout kernel: the
            # conv output enters (and the pooled result leaves) through free
            # layout bitcasts instead of full-resolution copy+reshape chains
            # (~1.3 ms/modality at s2 — docs/PERFORMANCE.md round 3). The
            # stem path keeps the merged kernel: the stem Pallas kernel
            # already emits the dense merged layout the pool wants — and
            # so does the banded body conv (band_world).
            body_conv = not ((use_stem and stem_ok) or band_world)
            if body_conv and not env_flag("TRANSMF_NO_BC_POOL"):
                return max_pool3d_2x2_affine_act_bc(
                    y, scale, shift, slope, self.use_stem_kernel)
            s_lanes = jnp.tile(scale, Z)
            b_lanes = jnp.tile(shift, Z)
            # (the merged->conv-native in-VMEM relayout experiment
            # TRANSMF_M2BC was removed in round 4: Mosaic cannot lower the
            # cross-sublane-dim scatter on real TPUs — see the
            # max_pool3d_2x2_affine_act docstring; XLA keeps the
            # pooled-size boundary copy)
            return max_pool3d_2x2_affine_act(
                y, s_lanes, b_lanes, slope, self.use_stem_kernel)
        z = bn_affine_reference(y, scale, shift, slope)
        if self.pool == "max":
            return max_pool3d_2x2(z, self.use_stem_kernel)
        if self.pool == "avg":
            return avg_pool3d_2x2(z, self.use_stem_kernel)
        return z


def max_pool3d(x, window: int = 2, stride: int = 2, fast: bool = True):
    """torch MaxPool3d(window, stride) with floor (VALID) semantics.

    The 2x2x2 case (the only one sNet uses) routes to the slice-based op in
    ops/pool3d.py: XLA's reduce-window/select-and-scatter lowering costs
    ~40% of the whole train step on TPU (see that module's docstring)."""
    if fast and window == 2 and stride == 2:
        from ..ops.pool3d import max_pool3d_2x2

        return max_pool3d_2x2(x)
    dims = (window,) * 3
    strides = (stride,) * 3
    return nn.max_pool(x, dims, strides=strides, padding="VALID")


def avg_pool3d(x, window: int = 2, stride: int = 2, fast: bool = True):
    if fast and window == 2 and stride == 2:
        from ..ops.pool3d import avg_pool3d_2x2

        return avg_pool3d_2x2(x)
    dims = (window,) * 3
    strides = (stride,) * 3
    return nn.avg_pool(x, dims, strides=strides, padding="VALID")


def _remat_worth_it(shape, features, itemsize=2):
    """Whether per-block remat pays for a ConvBNAct at this input shape.

    Remat frees the block's intra-block intermediates — the conv output
    and the activated tensor at INPUT spatial resolution (~2 tensors of
    prod(shape[:-1])*features elements; pooling happens after) — at the
    cost of recomputing the conv in the backward. The block INPUT is
    stored either way (it seeds the recompute), so when the intermediates
    are small the recompute buys nothing. Threshold tuned by full-res
    device A/B (docs/PERFORMANCE.md "Selective remat"): at 300 MB only
    the full-res stem block remats, which fit every measured config that
    any lower threshold fit while costing ~31 ms/step less than also
    wrapping the second block. TRANSMF_REMAT_MIN_MB overrides."""
    import os

    min_mb = float(os.environ.get("TRANSMF_REMAT_MIN_MB", "300"))
    inter = 2 * int(np.prod(shape[:-1])) * features * itemsize
    return inter >= min_mb * 2**20


class SNet(nn.Module):
    """Per-modality 3D-CNN encoder (paper fig. b).

    Stage plan mirrors the reference sNet (reference: models/networks.py:18-61):
    s1: Conv 1->dim/4, MaxPool2; s2: Conv dim/4->dim/4, Conv dim/4->dim/2,
    MaxPool2; s3: Conv dim/2->dim/2, Conv dim/2->dim, MaxPool2; s4:
    Conv dim->2dim (3^3), Conv 2dim->dim (1^3), AvgPool2. Net 16x spatial
    downsample; 91x109x91 input -> (5, 6, 5, dim) = 150 tokens.

    Input/output are channels-last: (B, X, Y, Z, C).
    """

    dim: int = 128
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None  # None=auto; False forces XLA convs
    remat: bool = False  # rematerialize per conv block (activation memory)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision,
                  axis_name=self.axis_name, use_stem_kernel=self.use_pallas)
        # SELECTIVE per-block remat: a rematted ConvBNAct recomputes its
        # forward in the backward, so its intra-block intermediates (conv
        # output + activation at INPUT spatial resolution, i.e. pre-pool)
        # are never stored — but the block's input is stored either way
        # (it seeds the recompute). Late blocks have tiny intermediates,
        # so rematting them pays conv recompute for ~no memory; only
        # blocks whose intermediates actually dominate HBM get wrapped.
        # Block-level granularity (vs whole-encoder remat) matters for the
        # same reason: one stage's activations live at a time.
        d = self.dim
        plan = [
            (d // 4, dict(pool="max")),
            (d // 4, {}),
            (d // 2, dict(pool="max")),
            (d // 2, {}),
            (d, dict(pool="max")),
            (d * 2, {}),
            (d, dict(kernel=(1, 1, 1), pool="avg")),
        ]
        for i, (feats, extra) in enumerate(plan):
            cls = (nn.remat(ConvBNAct, static_argnums=(2,))
                   if self.remat and _remat_worth_it(x.shape, feats)
                   else ConvBNAct)
            # explicit names: the remat lift renames the auto-derived
            # module ("CheckpointConvBNAct_i"), which would fork the param
            # tree between remat settings and break checkpoint portability
            x = cls(feats, **extra, **kw, name=f"ConvBNAct_{i}")(
                x, train, bn_mask)
        return x


class SFCN(nn.Module):
    """5-block fully-convolutional encoder (reference: models/networks.py:64-110,
    dead code there with stray debug prints — kept here as a working extra)."""

    channels: Sequence[int] = (32, 64, 128, 128, 64)
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act="relu", dtype=self.dtype, precision=self.precision,
                  axis_name=self.axis_name)
        for ch in self.channels[:4]:
            x = ConvBNAct(ch, pool="max", **kw)(x, train)
        x = ConvBNAct(self.channels[4], kernel=(1, 1, 1), **kw)(x, train)
        return x


def global_avg_pool(x):
    """AdaptiveAvgPool3d(1) + flatten for NDHWC feature maps -> (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))


def tokens_from_volume(x):
    """(B, X, Y, Z, C) -> (B, X*Y*Z, C) token grid, matching the reference's
    rearrange 'b d x y z -> b (x y z) d' (reference: models/mymodel.py:218)."""
    b = x.shape[0]
    return x.reshape(b, -1, x.shape[-1])

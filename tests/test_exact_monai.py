"""Exact-MONAI augmentation mode (data/exact_monai.py).

The reference pipeline is MONAI 1.3.2 (reference: datasets/ADNI.py:66-69);
monai itself is not installed in this image, but MONAI's resamples ARE
torch ops — Rotate ends in `torch.nn.functional.grid_sample(bilinear,
border, align_corners=False)` over a pixel-space affine, Zoom in
`torch.nn.functional.interpolate(mode='area', recompute_scale_factor=
True)` plus a replicate pad. These tests oracle the numpy implementations
against those exact torch kernels, with the MONAI glue (pixel affine,
keep_size pad split, per-sample shared draws) cited from the monai
sources in data/exact_monai.py.
"""

import numpy as np
import pytest

from transmf_ad_tpu.data import exact_monai
from transmf_ad_tpu.data.transforms import AugmentConfig

torch = pytest.importorskip("torch")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


class TestRotate:
    @pytest.mark.parametrize("angle", [0.05, -0.031, 0.002, 1.1])
    def test_matches_torch_grid_sample(self, rng, angle):
        import torch.nn.functional as F

        X, Y, Z = 9, 21, 17
        vol = rng.standard_normal((X, Y, Z)).astype(np.float32)

        # oracle: MONAI Rotate's pixel map (src = R(angle) @ (dst - c) + c,
        # c = (shape-1)/2, keep_size) sampled through the torch kernel
        # MONAI's AffineTransform calls
        cy, cz = (Y - 1) / 2.0, (Z - 1) / 2.0
        xs = np.arange(X, dtype=np.float64)
        yg = (np.arange(Y, dtype=np.float64) - cy)[:, None]
        zg = (np.arange(Z, dtype=np.float64) - cz)[None, :]
        ys = np.cos(angle) * yg - np.sin(angle) * zg + cy
        zs = np.sin(angle) * yg + np.cos(angle) * zg + cz
        # normalized sampling grid, align_corners=False: g = (2p+1)/n - 1
        gx = np.broadcast_to(((2 * xs + 1) / X - 1)[:, None, None], (X, Y, Z))
        gy = np.broadcast_to(((2 * ys + 1) / Y - 1)[None], (X, Y, Z))
        gz = np.broadcast_to(((2 * zs + 1) / Z - 1)[None], (X, Y, Z))
        # grid last dim is (W, H, D) = (our Z, Y, X)
        grid = torch.from_numpy(
            np.stack([gz, gy, gx], axis=-1)[None].astype(np.float32))
        t_out = F.grid_sample(
            torch.from_numpy(vol)[None, None], grid, mode="bilinear",
            padding_mode="border", align_corners=False)[0, 0].numpy()

        ours = exact_monai.rotate(vol, angle)
        np.testing.assert_allclose(ours, t_out, atol=1e-4, rtol=1e-4)

    def test_zero_angle_identity(self, rng):
        vol = rng.standard_normal((5, 8, 7)).astype(np.float32)
        np.testing.assert_allclose(exact_monai.rotate(vol, 0.0), vol,
                                   atol=1e-6)


class TestZoom:
    @pytest.mark.parametrize("factor", [0.95, 0.9637, 0.9999, 1.0])
    def test_matches_torch_area_interpolate(self, rng, factor):
        import torch.nn.functional as F

        vol = rng.standard_normal((13, 19, 11)).astype(np.float32)
        z = F.interpolate(torch.from_numpy(vol)[None, None],
                          scale_factor=factor, mode="area",
                          recompute_scale_factor=True)[0, 0].numpy()
        # MONAI keep_size pad: half = diff // 2 leading, rest trailing,
        # padding_mode='edge' (torch 'replicate')
        pads = []
        for od, zd in zip(vol.shape, z.shape):
            d = od - zd
            pads.append((d // 2, d - d // 2))
        t_out = np.pad(z, pads, mode="edge")

        ours = exact_monai.zoom(vol, factor)
        assert ours.shape == vol.shape
        np.testing.assert_allclose(ours, t_out, atol=1e-5, rtol=1e-5)

    def test_upscale_crops_back(self, rng):
        vol = rng.standard_normal((10, 12, 8)).astype(np.float32)
        out = exact_monai.zoom(vol, 1.25)
        assert out.shape == vol.shape
        assert np.isfinite(out).all()


class _ScriptedRng:
    """Deterministic stand-in for np.random.Generator: `random()` pops
    scripted probability draws, `uniform` returns the midpoint unless a
    scripted value is given."""

    def __init__(self, probs, uniforms):
        self.probs = list(probs)
        self.uniforms = list(uniforms)

    def random(self):
        return self.probs.pop(0)

    def uniform(self, lo, hi):
        return self.uniforms.pop(0) if self.uniforms else (lo + hi) / 2


class TestAugmentExact:
    def test_shared_draw_across_modalities_and_order(self, rng):
        vol_m = rng.standard_normal((7, 9, 8)).astype(np.float32)
        vol_p = rng.standard_normal((7, 9, 8)).astype(np.float32)
        cfg = AugmentConfig()
        # fire all three transforms: flip, rotate(0.04), zoom(0.96)
        sr = _ScriptedRng(probs=[0.0, 0.0, 0.0], uniforms=[0.04, 0.96])
        out = exact_monai.augment_exact(
            {"MRI": vol_m, "PET": vol_p, "label": np.int32(1)}, sr, cfg)
        for key, vol in (("MRI", vol_m), ("PET", vol_p)):
            expect = exact_monai.zoom(
                exact_monai.rotate(exact_monai.flip(vol, 0), 0.04), 0.96)
            np.testing.assert_allclose(out[key], expect, atol=1e-6)
        assert out["label"] == 1

    def test_prob_gating(self, rng):
        vol = rng.standard_normal((6, 7, 5)).astype(np.float32)
        # no transform fires -> identity (draws above every prob)
        sr = _ScriptedRng(probs=[0.99, 0.99, 0.99], uniforms=[0.04, 0.96])
        out = exact_monai.augment_exact({"MRI": vol}, sr, AugmentConfig())
        np.testing.assert_allclose(out["MRI"], vol, atol=0)

    def test_loader_sample_transform_does_not_mutate_cache(self, rng,
                                                           tmp_path):
        from transmf_ad_tpu.data.pipeline import Loader
        from transmf_ad_tpu.data.synthetic import make_synthetic_adni
        from transmf_ad_tpu.data.adni import ADNI

        root = str(tmp_path / "adni")
        make_synthetic_adni(root, n_per_group=2, shape=(8, 9, 8), seed=0)
        recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
        from transmf_ad_tpu.data.pipeline import VolumeSource

        source = VolumeSource(recs)
        transform = exact_monai.make_sample_transform(
            3, AugmentConfig(flip_prob=1.0, rotate_prob=1.0, zoom_prob=1.0))
        loader = Loader(source, batch_size=2, sample_transform=transform)

        before = source[0]["MRI"].copy()
        peeked = loader.peek()["MRI"]  # peek skips the transform
        np.testing.assert_array_equal(peeked[0], before)
        batches = list(loader)
        assert batches and batches[0]["MRI"].shape[1:] == (8, 9, 8)
        # augmented output differs; the RAM cache is untouched
        assert not np.allclose(batches[0]["MRI"][0], before)
        np.testing.assert_array_equal(source[0]["MRI"], before)

    def test_trainer_wires_exact_mode(self, tmp_path):
        """aug_exact=True: device aug off, loader gets the host transform,
        the HBM dataset cache is bypassed, training runs end to end."""
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.data.synthetic import make_synthetic_adni
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        root = str(tmp_path / "adni")
        make_synthetic_adni(root, n_per_group=3, shape=(16, 16, 16), seed=1)
        recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
        source = VolumeSource(recs, keys=("MRI",))
        train = Loader(source, list(range(4)), batch_size=2, shuffle=True,
                       seed=0)
        val = Loader(source, [4, 5], batch_size=2)

        cfg = TrainerConfig(model="single", dim=16, epochs=1, aug=True,
                            aug_exact=True, use_pallas=False,
                            dtype="float32", save_dir=str(tmp_path / "ckpt"))
        res = Trainer(cfg).fit(train, val, val)
        assert train.sample_transform is not None
        assert np.isfinite(res[0])

    def test_bf16_post_transform_cast(self, tmp_path):
        """Under bf16 compute, the trainer wraps the exact transform to
        cast volumes AFTER the f32 transform (half the H2D bytes); the
        transform math itself still sees float32 inputs."""
        import jax.numpy as jnp

        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.data.synthetic import make_synthetic_adni
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        root = str(tmp_path / "adni")
        make_synthetic_adni(root, n_per_group=3, shape=(16, 16, 16), seed=1)
        recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
        source = VolumeSource(recs, keys=("MRI",))  # f32 source cache
        train = Loader(source, list(range(4)), batch_size=2, shuffle=True,
                       seed=0)
        val = Loader(source, [4, 5], batch_size=2)

        cfg = TrainerConfig(model="single", dim=16, epochs=1, aug=True,
                            aug_exact=True, use_pallas=False,
                            dtype="bfloat16", progress=False,
                            save_dir=str(tmp_path / "ckpt"))
        res = Trainer(cfg).fit(train, val, val)
        assert np.isfinite(res[0])
        item = train.sample_transform(source[0])
        assert item["MRI"].dtype == np.dtype(jnp.bfloat16)
        assert source[0]["MRI"].dtype == np.float32  # cache untouched

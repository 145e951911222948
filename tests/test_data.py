"""Data layer tests: NIfTI IO, ADNI index, transforms, loader."""

import os

import numpy as np
import pytest

from transmf_ad_tpu.data import (
    ADNI,
    AugmentConfig,
    Loader,
    VolumeSource,
    augment_batch,
    nifti,
    spatial_pad,
)


class TestNifti:
    def test_roundtrip_gz(self, tmp_path, rng):
        vol = rng.standard_normal((7, 9, 5)).astype(np.float32)
        p = str(tmp_path / "x.nii.gz")
        nifti.save(p, vol)
        out = nifti.load(p)
        np.testing.assert_array_equal(out, vol)

    def test_roundtrip_plain(self, tmp_path, rng):
        vol = (rng.random((4, 4, 4)) * 100).astype(np.int16)
        p = str(tmp_path / "x.nii")
        nifti.save(p, vol)
        out = nifti.load(p)
        np.testing.assert_allclose(out, vol.astype(np.float32))

    def test_torch_free_parity_with_scaling(self, tmp_path):
        # Hand-build a header with scl_slope/inter and verify it's applied.
        vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
        p = str(tmp_path / "scl.nii")
        nifti.save(p, vol)
        raw = bytearray(open(p, "rb").read())
        import struct

        struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # slope 2, inter 1
        open(p, "wb").write(bytes(raw))
        out = nifti.load(p)
        np.testing.assert_allclose(out, vol * 2.0 + 1.0)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.nii")
        open(p, "wb").write(b"\x00" * 400)
        with pytest.raises(ValueError):
            nifti.load(p)


class TestADNI:
    def test_index_adcn(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        assert len(ds) == 8  # 4 CN + 4 AD
        labels = sorted(d["label"] for d in ds.data_dict)
        assert labels == [0] * 4 + [1] * 4
        rec = ds.data_dict[0]
        assert os.path.exists(rec["MRI"]) and os.path.exists(rec["PET"])

    def test_index_pmcismci(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "pMCIsMCI")
        assert len(ds) == 8
        assert ds.label_dict == {"sMCI": 0, "pMCI": 1}

    def test_index_mcicn_merges_positives(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "MCICN")
        neg, pos = ds.class_counts()
        assert (neg, pos) == (4.0, 8.0)  # CN vs sMCI+pMCI

    def test_unknown_task(self, adni_root):
        with pytest.raises(ValueError):
            ADNI(adni_root, "ADNI.csv", "nope")


class TestTransforms:
    def test_spatial_pad_centered(self):
        v = np.ones((3, 3, 3), np.float32)
        out = spatial_pad(v, (5, 6, 3))
        assert out.shape == (5, 6, 3)
        assert out[1:4, 1:4, :].sum() == 27  # centered (odd diff pads trailing)
        assert out.sum() == 27

    def test_augment_identity_when_no_trigger(self, rng):
        import jax

        vol = rng.random((8, 10, 8)).astype(np.float32)
        batch = {"MRI": np.stack([vol]), "PET": np.stack([vol])}
        cfg = AugmentConfig(flip_prob=0.0, rotate_prob=0.0, zoom_prob=0.0)
        keys = jax.random.split(jax.random.key(0), 1)
        out = augment_batch(batch, keys, cfg)
        np.testing.assert_allclose(np.asarray(out["MRI"][0]), vol, atol=1e-6)

    def test_augment_flip_exact(self, rng):
        import jax

        vol = rng.random((8, 10, 8)).astype(np.float32)
        batch = {"MRI": vol[None]}
        cfg = AugmentConfig(flip_prob=1.0, rotate_prob=0.0, zoom_prob=0.0)
        keys = jax.random.split(jax.random.key(0), 1)
        out = np.asarray(augment_batch(batch, keys, cfg)["MRI"][0])
        np.testing.assert_allclose(out, vol[::-1], atol=1e-5)

    def test_augment_same_draw_across_modalities(self, rng):
        import jax

        vol = rng.random((8, 8, 8)).astype(np.float32)
        batch = {"MRI": vol[None], "PET": vol[None]}
        cfg = AugmentConfig(flip_prob=0.5, rotate_prob=1.0, zoom_prob=1.0)
        keys = jax.random.split(jax.random.key(7), 1)
        out = augment_batch(batch, keys, cfg)
        np.testing.assert_allclose(
            np.asarray(out["MRI"][0]), np.asarray(out["PET"][0]), atol=1e-6
        )

    def test_zoom_shrinks_content(self, rng):
        import jax

        vol = np.zeros((16, 16, 16), np.float32)
        vol[4:12, 4:12, 4:12] = 1.0
        cfg = AugmentConfig(
            flip_prob=0.0, rotate_prob=0.0, zoom_prob=1.0, min_zoom=0.5, max_zoom=0.5
        )
        keys = jax.random.split(jax.random.key(0), 1)
        out = np.asarray(augment_batch({"x": vol[None]}, keys, cfg)["x"][0])
        # zoom 0.5 halves the bright cube volume (8^3 -> ~4^3)
        assert 40 <= out.sum() <= 90


class TestAugmentScipyOracle:
    """Independent ground truth for the banded-matmul resampler: trilinear
    resampling of the same dst->src affine via scipy.ndimage (order=1,
    mode='nearest' = MONAI padding_mode='border'), on smooth volumes, at
    the reference's parameter ranges (rotation U(-.05,.05) rad about axis
    0, zoom U(.95,1); reference: datasets/ADNI.py:66-76)."""

    @staticmethod
    def _smooth_volume(shape=(24, 28, 24), seed=5):
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(seed)
        v = gaussian_filter(rng.standard_normal(shape), sigma=2.0)
        v = (v - v.min()) / (v.max() - v.min())
        return v.astype(np.float32)

    @staticmethod
    def _oracle(vol, flip, angle, zoom):
        """out[d] = vol[src(d)]: x: mirror((x-cx)/zoom + cx);
        (y,z): R(angle) (d-c)/zoom + c. Rotation about axis 0 and the
        isotropic center zoom commute, so this covers both the impl's
        zoom->shear order and MONAI's rotate-then-zoom transform order."""
        from scipy.ndimage import map_coordinates

        X, Y, Z = vol.shape
        cx, cy, cz = (X - 1) / 2.0, (Y - 1) / 2.0, (Z - 1) / 2.0
        gx, gy, gz = np.meshgrid(
            np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
        )
        sx = (gx - cx) / zoom + cx
        if flip:
            sx = (X - 1) - sx
        yr = (gy - cy) / zoom
        zr = (gz - cz) / zoom
        c, s = np.cos(angle), np.sin(angle)
        sy = c * yr + s * zr + cy
        sz = -s * yr + c * zr + cz
        return map_coordinates(vol, [sx, sy, sz], order=1, mode="nearest")

    @staticmethod
    def _impl(vol, flip, angle, zoom):
        import jax.numpy as jnp

        from transmf_ad_tpu.data.transforms import _affine_resample

        return np.asarray(_affine_resample(
            jnp.asarray(vol), jnp.asarray(flip), jnp.asarray(angle, jnp.float32),
            jnp.asarray(zoom, jnp.float32), 0,
        ))

    def test_paeth_shears_compose_to_rotation(self):
        """The 3-shear constants (a=-tan(th/2), b=sin th) must compose to
        an exact rotation of the sampling grid — checked as the 2x2
        dst->src map in the (y,z) plane."""
        for angle in (-0.05, 0.013, 0.05, 0.3):
            a, b = -np.tan(angle / 2.0), np.sin(angle)
            # pass order shear_y(a), shear_z(b), shear_y(a); dst->src maps
            # compose outermost-pass-first: m3(m2(m1(d))) with m1 applied
            # to the final output grid
            sy = np.array([[1.0, -a], [0.0, 1.0]])   # (y, z) -> (y - a z, z)
            sz = np.array([[1.0, 0.0], [-b, 1.0]])   # (y, z) -> (y, z - b y)
            total = sy @ sz @ sy
            rot = np.array([[np.cos(angle), np.sin(angle)],
                            [-np.sin(angle), np.cos(angle)]])
            np.testing.assert_allclose(total, rot, atol=1e-12)

    def test_zoom_matches_oracle_closely(self):
        vol = self._smooth_volume()
        for zoom in (0.95, 0.97):
            got = self._impl(vol, False, 0.0, zoom)
            want = self._oracle(vol, False, 0.0, zoom)
            err = np.abs(got - want).max()
            assert err < 1e-5, f"zoom={zoom}: max err {err}"

    def test_rotation_matches_oracle(self):
        """3 sequential 1D linear interps are slightly smoother than one
        trilinear pass, and each pass border-clamps independently, so the
        error concentrates in the outermost voxels. Quantified at the full
        reference range (+-0.05 rad): interior max < 5e-3, volume rms
        ~1e-3, border corners up to ~1.1e-2 on a smooth unit-range volume."""
        vol = self._smooth_volume()
        for angle in (-0.05, 0.02, 0.05):
            got = self._impl(vol, False, angle, 1.0)
            want = self._oracle(vol, False, angle, 1.0)
            d = got - want
            assert np.abs(d).max() < 1.5e-2, f"angle={angle}"
            assert np.sqrt((d ** 2).mean()) < 1.5e-3, f"angle={angle}"
            inner = d[2:-2, 2:-2, 2:-2]
            assert np.abs(inner).max() < 5e-3, f"angle={angle} interior"

    def test_composed_flip_rotate_zoom_matches_oracle(self):
        """Composed case vs the reference-faithful SEQUENTIAL oracle:
        MONAI's Compose resamples RandRotate and RandZoom separately
        (reference: datasets/ADNI.py:66-76), so the ground truth here is
        flip -> scipy rotate resample -> scipy zoom resample. (The impl
        folds both into one affine — analytically identical since the
        center rotation and isotropic zoom commute — so residuals are
        pure resampling smoothing: rms ~2e-3, interior max ~8e-3,
        border corners up to ~4e-2 on a smooth unit-range volume.)"""
        from scipy.ndimage import map_coordinates

        vol = self._smooth_volume(seed=9)
        flip, angle, zoom = True, 0.05, 0.95
        X, Y, Z = vol.shape
        cx, cy, cz = (X - 1) / 2.0, (Y - 1) / 2.0, (Z - 1) / 2.0
        gx, gy, gz = np.meshgrid(
            np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
        )
        c, s = np.cos(angle), np.sin(angle)
        w = vol[::-1].copy() if flip else vol
        ry = c * (gy - cy) + s * (gz - cz) + cy
        rz = -s * (gy - cy) + c * (gz - cz) + cz
        w = map_coordinates(w, [gx.astype(float), ry, rz], order=1,
                            mode="nearest")
        sx = (gx - cx) / zoom + cx
        sy = (gy - cy) / zoom + cy
        sz = (gz - cz) / zoom + cz
        want = map_coordinates(w, [sx, sy, sz], order=1, mode="nearest")

        got = self._impl(vol, flip, angle, zoom)
        d = got - want
        assert np.sqrt((d ** 2).mean()) < 3e-3, "composed rms"
        assert np.abs(d[2:-2, 2:-2, 2:-2]).max() < 1e-2, "composed interior"
        assert np.abs(d).max() < 5e-2, "composed border"


class TestLoader:
    def test_batches_and_cache(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict)
        loader = Loader(src, batch_size=3, shuffle=False)
        batches = list(loader)
        assert len(batches) == 3  # 8 samples, no drop_last
        assert batches[0]["MRI"].shape == (3, 24, 28, 24)
        assert batches[-1]["MRI"].shape == (2, 24, 28, 24)
        assert batches[0]["MRI"].max() <= 1.0 and batches[0]["MRI"].min() >= 0.0
        assert batches[0]["label"].dtype == np.int32
        # cache hit path returns identical data
        again = list(Loader(src, batch_size=3, shuffle=False))
        np.testing.assert_array_equal(batches[0]["PET"], again[0]["PET"])

    def test_drop_last_and_shuffle_determinism(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict)
        l1 = Loader(src, batch_size=3, shuffle=True, drop_last=True, seed=5)
        l2 = Loader(src, batch_size=3, shuffle=True, drop_last=True, seed=5)
        b1, b2 = list(l1), list(l2)
        assert len(b1) == 2
        np.testing.assert_array_equal(b1[0]["label"], b2[0]["label"])

    def test_pad_to(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, pad_to=(32, 32, 32))
        b = next(iter(Loader(src, batch_size=2)))
        assert b["MRI"].shape == (2, 32, 32, 32)


class TestTransferDtype:
    """bfloat16 host cache/transfer (half the H2D bytes of float32)."""

    def test_bf16_cache_and_stack(self, adni_root):
        import jax.numpy as jnp

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, dtype=jnp.bfloat16)
        f32 = VolumeSource(ds.data_dict, dtype=np.float32)
        b16 = next(iter(Loader(src, batch_size=3)))
        b32 = next(iter(Loader(f32, batch_size=3)))
        assert b16["MRI"].dtype == np.dtype(jnp.bfloat16)
        assert b16["MRI"].nbytes * 2 == b32["MRI"].nbytes
        # bfloat16 quantization of [0,1] intensities: <= 2^-9 relative
        err = np.abs(b16["MRI"].astype(np.float32) - b32["MRI"])
        assert err.max() <= 2.0 ** -9
        # normalization itself ran in float32 (cast is the LAST host step)
        assert b16["MRI"].astype(np.float32).max() <= 1.0
        assert b16["label"].dtype == np.int32

    def test_bf16_pad_batch_and_eval_pad(self, adni_root):
        import jax.numpy as jnp

        from transmf_ad_tpu.data.pipeline import pad_batch

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, dtype=jnp.bfloat16)
        b = next(iter(Loader(src, batch_size=3)))
        out = pad_batch(b, 4)
        assert out["MRI"].dtype == np.dtype(jnp.bfloat16)
        assert out["MRI"].shape[0] == 4 and out["mask"].tolist() == [1, 1, 1, 0]

    @pytest.mark.slow
    def test_bf16_feed_trains(self, adni_root, tmp_path):
        """End-to-end: a bfloat16-compute model fed bfloat16 volumes takes a
        finite train step whose logits track the float32-fed step."""
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.train.optim import build_optimizer
        from transmf_ad_tpu.train.steps import create_state, make_train_step

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, dtype=jnp.bfloat16)
        batch = next(iter(Loader(src, batch_size=2)))
        model = build_model("single", dim=16, use_pallas=False,
                            dtype=jnp.bfloat16)
        tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)
        inputs = [jnp.asarray(batch["MRI"][..., None])]
        state = create_state(model, tx, inputs, jax.random.key(0))
        step = make_train_step(("MRI",), adversarial=False, aug_cfg=None)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        new_state, aux = step(state, dev, jax.random.key(1))
        assert np.isfinite(float(aux["ce_loss"]))
        assert int(new_state.step) == 1

    def test_transfer_dtype_resolution(self):
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.config import Options
        from transmf_ad_tpu.train.kfold import transfer_dtype

        opt = Options()
        want = (np.dtype(jnp.bfloat16)
                if jax.default_backend() == "tpu" else np.float32)
        assert transfer_dtype(opt) == want
        opt.dtype = "float32"
        assert transfer_dtype(opt) == np.float32
        opt.dtype = "bfloat16"
        assert transfer_dtype(opt) == np.dtype(jnp.bfloat16)
        opt.feed_dtype = "uint8"
        assert transfer_dtype(opt) == np.uint8
        # exact-MONAI host augmentation overrides back to float32
        opt.aug_exact = "True"
        assert transfer_dtype(opt) == np.float32


class TestUint8Feed:
    """uint8 quantized host cache/transfer (1/4 the float32 bytes;
    device-side dequant — pipeline.VolumeSource / steps.dequantize_input)."""

    def test_quantization_roundtrip(self, adni_root):
        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        q = VolumeSource(ds.data_dict, dtype=np.uint8)
        f = VolumeSource(ds.data_dict, dtype=np.float32)
        bq = next(iter(Loader(q, batch_size=3)))
        bf = next(iter(Loader(f, batch_size=3)))
        assert bq["MRI"].dtype == np.uint8
        assert bq["MRI"].nbytes * 4 == bf["MRI"].nbytes
        # q = round(255*x): dequant error bounded by half a step
        err = np.abs(bq["MRI"].astype(np.float32) / 255.0 - bf["MRI"])
        assert err.max() <= 0.5 / 255 + 1e-6

    def test_requires_normalize(self, adni_root):
        import pytest

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        with pytest.raises(ValueError, match="normalize"):
            VolumeSource(ds.data_dict, dtype=np.uint8, normalize=False)

    def test_dequantize_input(self):
        import jax.numpy as jnp

        from transmf_ad_tpu.train.steps import dequantize_input

        q = jnp.asarray(np.arange(256, dtype=np.uint8))
        x = dequantize_input(q)
        assert x.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(x),
                                   np.arange(256, dtype=np.float32) / 255.0,
                                   rtol=0, atol=1e-7)
        f = jnp.ones((3,), jnp.bfloat16)
        assert dequantize_input(f) is f  # non-integer passthrough

    def test_step_matches_dequantized_f32_feed(self, adni_root):
        """A train step fed uint8 volumes computes EXACTLY the step fed
        the dequantized float32 volumes (dequant is the only difference)."""
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.train.optim import build_optimizer
        from transmf_ad_tpu.train.steps import create_state, make_train_step

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, dtype=np.uint8)
        batch = next(iter(Loader(src, batch_size=2)))
        model = build_model("single", dim=16, use_pallas=False,
                            dtype="float32")
        tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)
        scale = np.float32(1.0 / 255.0)  # dequantize_input's exact expression
        inputs = [jnp.asarray(batch["MRI"][..., None].astype(np.float32)
                              * scale)]
        state = create_state(model, tx, inputs, jax.random.key(0))
        step = make_train_step(("MRI",), adversarial=False, aug_cfg=None,
                               donate=False)
        dev_q = {k: jnp.asarray(v) for k, v in batch.items()}
        dev_f = dict(dev_q)
        dev_f["MRI"] = jnp.asarray(
            batch["MRI"].astype(np.float32) * scale)
        _, aux_q = step(state, dev_q, jax.random.key(1))
        _, aux_f = step(state, dev_f, jax.random.key(1))
        np.testing.assert_array_equal(np.asarray(aux_q["logits"]),
                                      np.asarray(aux_f["logits"]))

    def test_trainer_uint8_end_to_end(self, adni_root, tmp_path):
        """Trainer.fit with a uint8 source (device cache on) trains and
        evaluates to finite metrics."""
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        ds = ADNI(adni_root, "ADNI.csv", "ADCN")
        src = VolumeSource(ds.data_dict, dtype=np.uint8)
        train = Loader(src, list(range(6)), batch_size=3, shuffle=True,
                       seed=1)
        val = Loader(src, list(range(6, len(src))), batch_size=3)
        cfg = TrainerConfig(model="single", dim=8, epochs=2, aug=True,
                            save_dir=str(tmp_path), use_pallas=False,
                            dtype="float32", progress=False)
        res = Trainer(cfg).fit(train, val, val)
        assert res is not None and np.isfinite(res[0])


class TestNativeLoader:
    def test_native_matches_python(self, adni_root):
        from transmf_ad_tpu.data import native_loader
        from transmf_ad_tpu.data.adni import ADNI

        if not native_loader.available():
            pytest.skip("no native toolchain")
        rec = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict[0]
        shape = native_loader.peek_dims(rec["MRI"])
        native = native_loader.decode(rec["MRI"], shape, normalize=False)
        py = nifti.load(rec["MRI"])
        np.testing.assert_allclose(native, py, atol=1e-6)
        # normalized path matches the python min-max
        nat_n = native_loader.decode(rec["MRI"], shape, normalize=True)
        lo, hi = py.min(), py.max()
        np.testing.assert_allclose(nat_n, (py - lo) / (hi - lo), atol=1e-5)

    def test_batch_decode(self, adni_root):
        from transmf_ad_tpu.data import native_loader
        from transmf_ad_tpu.data.adni import ADNI

        if not native_loader.available():
            pytest.skip("no native toolchain")
        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict[:4]
        paths = [r["PET"] for r in recs]
        shape = native_loader.peek_dims(paths[0])
        batch = native_loader.decode_batch(paths, shape)
        assert batch.shape == (4, *shape)
        one = native_loader.decode(paths[2], shape)
        np.testing.assert_array_equal(batch[2], one)

    def test_bad_path_raises(self, tmp_path):
        from transmf_ad_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        with pytest.raises(ValueError):
            native_loader.decode(str(tmp_path / "missing.nii.gz"), (4, 4, 4))

    def test_source_native_parity(self, adni_root):
        from transmf_ad_tpu.data import native_loader
        from transmf_ad_tpu.data.adni import ADNI

        if not native_loader.available():
            pytest.skip("no native toolchain")
        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        s_py = VolumeSource(recs, use_native=False)
        s_nat = VolumeSource(recs, use_native=True)
        a, b = s_py[0], s_nat[0]
        np.testing.assert_allclose(a["MRI"], b["MRI"], atol=1e-5)
        np.testing.assert_allclose(a["PET"], b["PET"], atol=1e-5)


class TestBigEndianNifti:
    def _write_big_endian(self, path, vol):
        """Hand-craft a big-endian NIfTI-1 (the parser's swap path)."""
        import struct

        hdr = bytearray(348)
        struct.pack_into(">i", hdr, 0, 348)
        dim = [vol.ndim] + list(vol.shape) + [1] * (7 - vol.ndim)
        struct.pack_into(">8h", hdr, 40, *dim)
        struct.pack_into(">h", hdr, 70, 16)  # float32
        struct.pack_into(">h", hdr, 72, 32)
        struct.pack_into(">f", hdr, 108, 352.0)
        struct.pack_into(">2f", hdr, 112, 1.0, 0.0)
        hdr[344:348] = b"n+1\x00"
        payload = bytes(hdr) + b"\x00" * 4 + (
            vol.astype(">f4").tobytes(order="F"))
        open(path, "wb").write(payload)

    def test_python_parser_swaps(self, tmp_path, rng):
        vol = rng.standard_normal((5, 6, 4)).astype(np.float32)
        p = str(tmp_path / "be.nii")
        self._write_big_endian(p, vol)
        out = nifti.load(p)
        np.testing.assert_allclose(out, vol, atol=1e-6)

    def test_native_parser_swaps(self, tmp_path, rng):
        from transmf_ad_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        vol = rng.standard_normal((5, 6, 4)).astype(np.float32)
        p = str(tmp_path / "be.nii")
        self._write_big_endian(p, vol)
        out = native_loader.decode(p, (5, 6, 4), normalize=False)
        np.testing.assert_allclose(out, vol, atol=1e-6)


class TestPadBatch:
    def test_duplicate_pad_and_mask(self):
        from transmf_ad_tpu.data.pipeline import pad_batch

        b = {
            "MRI": np.arange(3 * 4).reshape(3, 4).astype(np.float32),
            "label": np.array([0, 1, 1], np.int32),
        }
        out = pad_batch(b, 8)
        assert out["MRI"].shape == (8, 4)
        assert out["label"].shape == (8,)
        # wrap-around duplicates of REAL samples, not zeros
        np.testing.assert_array_equal(out["MRI"][3], b["MRI"][0])
        np.testing.assert_array_equal(out["MRI"][7], b["MRI"][1])
        np.testing.assert_array_equal(out["label"][3:6], b["label"])
        np.testing.assert_array_equal(out["mask"],
                                      [1, 1, 1, 0, 0, 0, 0, 0])

    def test_full_batch_is_passthrough_with_mask(self):
        from transmf_ad_tpu.data.pipeline import pad_batch

        b = {"MRI": np.ones((4, 2), np.float32),
             "label": np.zeros(4, np.int32)}
        out = pad_batch(b, 4)
        np.testing.assert_array_equal(out["MRI"], b["MRI"])
        np.testing.assert_array_equal(out["mask"], np.ones(4))

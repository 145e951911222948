"""HBM-resident dataset cache (data/device_cache.py).

The cached feed must be a BIT-IDENTICAL drop-in for the host path
(Loader -> pad_batch -> DeviceFeed): same shuffle order, same wrap-around
duplicate padding, same masks — just assembled by an on-device gather
instead of per-epoch H2D transfers. Sharded variants run on the virtual
8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu.data.adni import ADNI
from transmf_ad_tpu.data.device_cache import (DeviceCachedFeed,
                                              HybridCachedFeed, cache_bytes,
                                              fits_budget)
from transmf_ad_tpu.data.pipeline import Loader, VolumeSource, pad_batch


def _loader(adni_root, batch_size=3, shuffle=True, drop_last=False, seed=7):
    recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
    src = VolumeSource(recs)
    return Loader(src, batch_size=batch_size, shuffle=shuffle,
                  drop_last=drop_last, seed=seed)


class TestDeviceCachedFeed:
    def test_matches_host_path_bitwise(self, adni_root):
        """Two epochs: every batch (volumes, labels, mask) equals the host
        Loader + pad_batch output, in the same shuffled order."""
        host = _loader(adni_root)
        cached = DeviceCachedFeed(_loader(adni_root), mesh=None, pad_to=3)
        for _ in range(2):  # epoch 2 re-shuffles; rng streams must agree
            host_batches = [pad_batch(b, 3) for b in host]
            dev_batches = list(cached)
            assert len(dev_batches) == len(host_batches) == len(host)
            for hb, db in zip(host_batches, dev_batches):
                for k in ("MRI", "PET", "label", "mask"):
                    np.testing.assert_array_equal(
                        np.asarray(db[k]), hb[k], err_msg=k)

    def test_fill_happens_once(self, adni_root):
        cached = DeviceCachedFeed(_loader(adni_root))
        list(cached)
        store = cached._store
        list(cached)
        assert cached._store is store  # second epoch reuses the fill

    def test_sharded_gather_matches_host(self, adni_root):
        """Under a data=4 mesh the store is sharded over devices and the
        gathered batches (sharded P('data')) still match the host path."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        devices = np.array(jax.devices()[:4]).reshape(4, 1)
        mesh = Mesh(devices, ("data", "model"))
        host = _loader(adni_root, batch_size=4)
        cached = DeviceCachedFeed(_loader(adni_root, batch_size=4),
                                  mesh=mesh)
        assert cached.pad_to == 4
        host_batches = [pad_batch(b, 4) for b in host]
        dev_batches = list(cached)
        for k, v in cached._store.items():
            assert v.sharding.is_equivalent_to(
                NamedSharding(mesh, P("data")), v.ndim)
        for hb, db in zip(host_batches, dev_batches):
            assert db["MRI"].sharding.is_equivalent_to(
                NamedSharding(mesh, P("data")), db["MRI"].ndim)
            for k in ("MRI", "PET", "label", "mask"):
                np.testing.assert_array_equal(
                    np.asarray(db[k]), hb[k], err_msg=k)

    def test_ragged_batch_wrap_padding(self, adni_root):
        """8 samples at batch 3 -> final batch has 2 real + 1 wrapped
        duplicate with mask [1,1,0] (pipeline.pad_batch semantics)."""
        loader = _loader(adni_root, shuffle=False)
        n = len(loader.indices)
        cached = DeviceCachedFeed(_loader(adni_root, shuffle=False))
        batches = list(cached)
        last = batches[-1]
        rem = n % 3 or 3
        mask = np.asarray(last["mask"])
        assert mask[:rem].all() and not mask[rem:].any()
        if rem < 3:
            np.testing.assert_array_equal(np.asarray(last["MRI"])[rem],
                                          np.asarray(last["MRI"])[0])

    def test_budget_math(self, adni_root):
        loader = _loader(adni_root)
        per_dev = cache_bytes(loader, mesh=None)
        n = len(loader.indices)
        vol = 24 * 28 * 24 * 4  # float32 synthetic volumes
        assert per_dev == n * vol * 2  # MRI + PET
        assert fits_budget(loader, budget=per_dev)
        assert not fits_budget(loader, budget=per_dev - 1)

        from jax.sharding import Mesh

        devices = np.array(jax.devices()[:4]).reshape(4, 1)
        mesh = Mesh(devices, ("data", "model"))
        n_pad = -(-n // 4) * 4
        assert cache_bytes(loader, mesh) == (n_pad // 4) * vol * 2

    def test_trainer_auto_cache_trains(self, adni_root, tmp_path):
        """Trainer with device_cache='on' end-to-end on the CPU mesh:
        the cached feed drives training and validation to completion."""
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        train = Loader(src, list(range(6)), batch_size=3, shuffle=True,
                       seed=1)
        val = Loader(src, list(range(6, len(src))), batch_size=3)
        cfg = TrainerConfig(model="single", dim=8, epochs=2, aug=False,
                            save_dir=str(tmp_path), use_pallas=False,
                            dtype="float32", device_cache="on",
                            progress=False)
        tr = Trainer(cfg)
        res = tr.fit(train, val, val)
        assert res is not None and np.isfinite(res[0])

    def test_trainer_budget_fallback_streams(self, adni_root, tmp_path,
                                             monkeypatch):
        """Over-budget sets must fall back to the streaming DeviceFeed
        under 'auto' and raise under 'on'."""
        monkeypatch.setenv("TRANSMF_CACHE_BUDGET_MB", "0.001")
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        train = Loader(src, list(range(6)), batch_size=3, shuffle=True,
                       seed=1)
        val = Loader(src, list(range(6, len(src))), batch_size=3)
        cfg = TrainerConfig(model="single", dim=8, epochs=1, aug=False,
                            save_dir=str(tmp_path), use_pallas=False,
                            dtype="float32", device_cache="auto",
                            progress=False)
        res = Trainer(cfg).fit(train, val, val)
        assert res is not None and np.isfinite(res[0])

        cfg_on = TrainerConfig(model="single", dim=8, epochs=1, aug=False,
                               save_dir=str(tmp_path / "on"),
                               use_pallas=False, dtype="float32",
                               device_cache="on", progress=False)
        with pytest.raises(ValueError, match="budget"):
            Trainer(cfg_on).fit(train, val, val)

    def test_sharded_cache_ragged_matches_single_device(self, adni_root,
                                                        tmp_path):
        """device_cache='on' + a RAGGED final batch (drop_last=False) under
        the 8-device shard_map mesh: the duplicate-padded rows are masked
        out of loss/metrics and BN statistics, so the final parameters
        match the single-device streaming run (SGD: divergence stays at
        reduction-order noise)."""
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        n = min(10, len(src) - 3)  # batch 4 -> ragged final batch

        def run(data_parallel, cache, subdir):
            train = Loader(src, list(range(n)), batch_size=4, shuffle=True,
                           seed=2, drop_last=False)
            val = Loader(src, list(range(n, len(src))), batch_size=3)
            cfg = TrainerConfig(
                model="single", dim=8, optimizer="SGD", lr=1e-2,
                momentum=0.9, epochs=2, aug=False, seed=5,
                save_dir=str(tmp_path / subdir), use_pallas=False,
                dtype="float32", device_cache=cache,
                data_parallel=data_parallel, progress=False)
            t = Trainer(cfg)
            t.fit(train, val, None)
            return np.concatenate([
                np.asarray(p).ravel()
                for p in jax.tree_util.tree_leaves(t.state.params)])

        sharded = run(True, "on", "mesh")
        single = run(False, "off", "single")
        assert n % 4 != 0  # the scenario really has a ragged batch
        np.testing.assert_allclose(sharded, single, rtol=5e-5, atol=5e-6)

    def test_on_raises_for_uncacheable_loader(self, adni_root, tmp_path):
        """device_cache='on' must raise for ANY reason caching cannot
        happen — here a pre-wrapped DeviceFeed with no .source."""
        from transmf_ad_tpu.data.pipeline import DeviceFeed
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        train = DeviceFeed(Loader(src, list(range(6)), batch_size=3,
                                  shuffle=True, seed=1), pad_to=3)
        val = Loader(src, list(range(6, len(src))), batch_size=3)
        cfg = TrainerConfig(model="single", dim=8, epochs=1, aug=False,
                            save_dir=str(tmp_path), use_pallas=False,
                            dtype="float32", device_cache="on",
                            progress=False)
        with pytest.raises(ValueError, match="cannot be cached"):
            Trainer(cfg).fit(train, val, val)

    def test_rejects_sample_transform(self, adni_root):
        """Cached feeds never revisit the host, so a host per-sample
        transform must be rejected, not silently dropped."""
        loader = _loader(adni_root)
        loader.sample_transform = lambda it: it
        with pytest.raises(ValueError, match="sample_transform"):
            DeviceCachedFeed(loader)
        with pytest.raises(ValueError, match="sample_transform"):
            HybridCachedFeed(loader)


def _row_bytes(adni_root):
    return 24 * 28 * 24 * 4 * 2  # float32 synthetic volumes, MRI + PET


class TestHybridCachedFeed:
    def test_matches_host_path_bitwise(self, adni_root):
        """With a budget fitting ~half the rows, two epochs of hot-gather +
        cold-scatter batches equal the host Loader + pad_batch output
        exactly, in the same shuffled order."""
        host = _loader(adni_root)
        n = len(host.indices)
        budget = (n // 2) * _row_bytes(adni_root)
        hybrid = HybridCachedFeed(_loader(adni_root), pad_to=3,
                                  budget=budget)
        assert 0 < hybrid.n_hot < n
        for _ in range(2):  # epoch 2 re-shuffles; rng streams must agree
            host_batches = [pad_batch(b, 3) for b in host]
            dev_batches = list(hybrid)
            assert len(dev_batches) == len(host_batches)
            for hb, db in zip(host_batches, dev_batches):
                for k in ("MRI", "PET", "label", "mask"):
                    np.testing.assert_array_equal(
                        np.asarray(db[k]), hb[k], err_msg=k)

    @pytest.mark.parametrize("n_hot_rows", [0, 10**6])
    def test_all_cold_and_all_hot_edges(self, adni_root, n_hot_rows):
        """budget=0 (every row streamed+scattered) and budget=inf (pure
        device gather) both reproduce the host path."""
        host = _loader(adni_root, shuffle=False)
        hybrid = HybridCachedFeed(
            _loader(adni_root, shuffle=False), pad_to=3,
            budget=n_hot_rows * _row_bytes(adni_root))
        n = len(host.indices)
        assert hybrid.n_hot == (0 if n_hot_rows == 0 else n)
        for hb, db in zip((pad_batch(b, 3) for b in host), hybrid):
            for k in ("MRI", "PET", "label", "mask"):
                np.testing.assert_array_equal(
                    np.asarray(db[k]), hb[k], err_msg=k)

    def test_trainer_hybrid_tier_trains(self, adni_root, tmp_path,
                                        monkeypatch):
        """Trainer on a single device with an over-budget set routes
        through the hybrid tier and trains to completion."""
        from transmf_ad_tpu.data.device_cache import HybridCachedFeed as H
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        budget_mb = 4 * _row_bytes(adni_root) / 2**20  # ~4 rows hot
        monkeypatch.setenv("TRANSMF_CACHE_BUDGET_MB", f"{budget_mb:.6f}")
        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        train = Loader(src, list(range(6)), batch_size=2, shuffle=True,
                       seed=1)
        val = Loader(src, list(range(6, len(src))), batch_size=2)
        cfg = TrainerConfig(model="single", dim=8, epochs=2, aug=False,
                            save_dir=str(tmp_path), use_pallas=False,
                            dtype="float32", device_cache="hybrid",
                            data_parallel=False, progress=False)
        res = Trainer(cfg).fit(train, val, val)
        assert res is not None and np.isfinite(res[0])

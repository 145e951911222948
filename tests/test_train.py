"""Training layer tests: optimizers, metrics, engine, checkpointing, steps."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmf_ad_tpu.train import (
    Engine,
    Events,
    MetricState,
    build_optimizer,
    checkpoint as ckpt,
    confusion_metrics,
    create_state,
    make_eval_step,
    make_train_step,
    roc_auc,
    streaming_auc_init,
    streaming_auc_result,
    streaming_auc_update,
)


class TestOptim:
    def test_multistep_schedule_matches_reference_adam(self):
        # Adam milestones [25, 36] gamma .1 (reference: utils/utils.py:40)
        _, sched = build_optimizer("Adam", lr=1e-4, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(249)) == pytest.approx(1e-4)
        assert float(sched(250)) == pytest.approx(1e-5)
        assert float(sched(360)) == pytest.approx(1e-6)

    def test_sgd_momentum_and_custom_milestones(self):
        tx, sched = build_optimizer("SGD", lr=1e-3, steps_per_epoch=5,
                                    milestones=(6, 21), momentum=0.9)
        assert float(sched(5 * 6)) == pytest.approx(1e-4)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        g = {"w": jnp.ones(3)}
        updates, _ = tx.update(g, state, params)
        assert np.allclose(np.asarray(updates["w"]), -1e-3)

    def test_constant_schedule_for_advit(self):
        _, sched = build_optimizer("Adam", lr=1e-4, steps_per_epoch=10,
                                   milestones=())
        assert float(sched(10_000)) == pytest.approx(1e-4)

    def test_adam_matches_torch_one_step(self, rng):
        import torch

        w0 = rng.standard_normal(5).astype(np.float32)
        g = rng.standard_normal(5).astype(np.float32)
        tx, _ = build_optimizer("Adam", lr=1e-2, steps_per_epoch=1,
                                milestones=())
        params = {"w": jnp.asarray(w0)}
        st = tx.init(params)
        up, _ = tx.update({"w": jnp.asarray(g)}, st, params)
        ours = np.asarray(params["w"] + up["w"])

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.Adam([tw], lr=1e-2)
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        np.testing.assert_allclose(ours, tw.detach().numpy(), atol=1e-6)


class TestMetrics:
    def test_roc_auc_matches_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score

        for _ in range(5):
            scores = rng.random(50)
            scores[rng.random(50) < 0.3] = 0.5  # inject ties
            labels = rng.integers(0, 2, 50)
            if labels.min() == labels.max():
                continue
            assert roc_auc(scores, labels) == pytest.approx(
                roc_auc_score(labels, scores), abs=1e-12
            )

    def test_confusion_metrics_reference_convention(self):
        # TP=c[1,1], FN=c[1,0], FP=c[0,1], TN=c[0,0] (utils/utils.py:44-51)
        c = np.array([[8.0, 2.0], [1.0, 9.0]])
        m = confusion_metrics(c)
        assert m["sen"] == pytest.approx(0.9)
        assert m["spe"] == pytest.approx(0.8)
        prec, rec = 9 / 11, 0.9
        assert m["f1"] == pytest.approx(2 * prec * rec / (prec + rec))

    def test_metric_state_accumulates(self):
        ms = MetricState.zero()
        logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]])
        labels = jnp.asarray([0, 1, 1])
        ms = ms.update(logits, labels, jnp.asarray(0.5))
        assert float(ms.correct) == 2 and float(ms.total) == 3
        conf = np.asarray(ms.confusion)
        assert conf[1, 0] == 1 and conf[1, 1] == 1 and conf[0, 0] == 1

    def test_streaming_auc_close_to_exact(self, rng):
        scores = rng.random(400)
        labels = (scores + 0.3 * rng.standard_normal(400) > 0.5).astype(int)
        st = streaming_auc_init(512)
        st = streaming_auc_update(st, jnp.asarray(scores), jnp.asarray(labels))
        approx = streaming_auc_result(st)
        exact = roc_auc(scores, labels)
        assert abs(approx - exact) < 0.01


class TestEngine:
    def test_event_order_and_state(self):
        seen = []
        eng = Engine(lambda e, b: seen.append(("step", e.state.epoch, b)))
        eng.add_event_handler(Events.EPOCH_STARTED,
                              lambda e: seen.append(("es", e.state.epoch)))
        eng.add_event_handler(Events.EPOCH_COMPLETED,
                              lambda e: seen.append(("ec", e.state.epoch)))
        eng.run([1, 2], max_epochs=2)
        assert seen == [
            ("es", 1), ("step", 1, 1), ("step", 1, 2), ("ec", 1),
            ("es", 2), ("step", 2, 1), ("step", 2, 2), ("ec", 2),
        ]

    def test_terminate_and_remove_handler(self):
        eng = Engine(lambda e, b: None)

        def stop(e):
            e.terminate()

        eng.add_event_handler(Events.EPOCH_COMPLETED, stop)
        state = eng.run([1], max_epochs=10)
        assert state.epoch == 1
        eng.remove_event_handler(stop, Events.EPOCH_COMPLETED)
        state = eng.run([1], max_epochs=3)
        assert state.epoch == 3


class TestCheckpoint:
    def test_best_retention_greater_or_equal(self, tmp_path):
        c = ckpt.BestCheckpointer(str(tmp_path))
        t = {"params": {"w": jnp.ones(3)}}
        assert c.maybe_save(t, 0.5, 1) is not None
        assert c.maybe_save(t, 0.4, 2) is None  # worse -> skipped
        assert c.maybe_save(t, 0.5, 3) is not None  # equal -> saved (>=)
        assert c.maybe_save(t, 0.7, 4) is not None
        files = os.listdir(tmp_path)
        assert len(files) == 1 and "accuracy=0.7000" in files[0]

    def test_roundtrip_and_find_best(self, tmp_path):
        c = ckpt.BestCheckpointer(str(tmp_path))
        t = {"params": {"w": jnp.arange(3, dtype=jnp.float32)}}
        c.maybe_save(t, 0.9, 7)
        path = ckpt.find_best(str(tmp_path))
        assert path and "accuracy=0.9000" in path
        out = ckpt.load(path, {"params": {"w": jnp.zeros(3)}})
        np.testing.assert_array_equal(np.asarray(out["params"]["w"]), [0, 1, 2])

    def test_latest_roundtrip(self, tmp_path):
        t = {"state": {"w": jnp.ones(2)}, "epoch": 5}
        ckpt.save_latest(str(tmp_path), t)
        out = ckpt.load_latest(str(tmp_path), {"state": {"w": jnp.zeros(2)}, "epoch": 0})
        assert out["epoch"] == 5


class TestSteps:
    def _batch(self, rng, b=4, shape=(16, 16, 16)):
        return {
            "MRI": jnp.asarray(rng.standard_normal((b, *shape)), jnp.float32),
            "PET": jnp.asarray(rng.standard_normal((b, *shape)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        }

    def test_train_step_decreases_loss(self, rng):
        from transmf_ad_tpu.models import build_model

        model = build_model("cnn_ad", dim=8)
        batch = self._batch(rng)
        tx, _ = build_optimizer("Adam", lr=1e-3, steps_per_epoch=1)
        state = create_state(
            model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
            jax.random.key(0),
        )
        step = make_train_step(("MRI", "PET"), adversarial=True, aug_cfg=None)
        rng_key = jax.random.key(1)
        st, first = step(state, batch, rng_key)  # state is donated here
        first_loss = float(first["loss"])
        for _ in range(15):
            st, aux = step(st, batch, rng_key)
        assert float(aux["loss"]) < first_loss
        assert int(st.step) == 16

    def test_eval_step_deterministic(self, rng):
        from transmf_ad_tpu.models import build_model

        model = build_model("single", dim=8)
        batch = self._batch(rng)
        tx, _ = build_optimizer("Adam", lr=1e-3, steps_per_epoch=1)
        state = create_state(model, tx, [batch["MRI"][..., None]],
                             jax.random.key(0))
        ev = make_eval_step(("MRI",), adversarial=False)
        ms1, o1 = ev(state, MetricState.zero(), batch)
        ms2, o2 = ev(state, MetricState.zero(), batch)
        np.testing.assert_array_equal(np.asarray(o1["probs"]),
                                      np.asarray(o2["probs"]))
        assert o1["probs"].shape == (4,)
        assert float(ms1.total) == 4
        np.testing.assert_array_equal(np.asarray(ms1.confusion),
                                      np.asarray(ms2.confusion))

    def test_eval_step_mask_excludes_padding(self, rng):
        """Padded samples must not contribute to loss/accuracy/confusion:
        metrics over [real | zero-padded] with a mask == metrics over the
        real samples alone."""
        from transmf_ad_tpu.models import build_model

        model = build_model("single", dim=8)
        batch = self._batch(rng, b=3)
        tx, _ = build_optimizer("Adam", lr=1e-3, steps_per_epoch=1)
        state = create_state(model, tx, [batch["MRI"][..., None]],
                             jax.random.key(0))
        ev = make_eval_step(("MRI",), adversarial=False)
        ms_ref, o_ref = ev(state, MetricState.zero(), batch)

        padded = {
            "MRI": jnp.concatenate(
                [batch["MRI"], jnp.zeros((1, *batch["MRI"].shape[1:]))]),
            "label": jnp.concatenate([batch["label"],
                                      jnp.zeros((1,), jnp.int32)]),
            "mask": jnp.asarray([1.0, 1.0, 1.0, 0.0]),
        }
        ms_pad, o_pad = ev(state, MetricState.zero(), padded)
        assert float(ms_pad.total) == float(ms_ref.total) == 3
        assert float(ms_pad.correct) == float(ms_ref.correct)
        assert float(ms_pad.loss_sum) == pytest.approx(
            float(ms_ref.loss_sum), rel=1e-6)
        np.testing.assert_allclose(np.asarray(ms_pad.confusion),
                                   np.asarray(ms_ref.confusion))


class TestMaskedBN:
    """mask_bn=True must make a duplicate-padded ragged batch train
    EXACTLY like feeding the short batch as-is (the reference behavior,
    reference: kfold_train_adversarial.py:64-66): BN batch moments,
    running stats, loss and parameter updates all match."""

    def _short_batch(self, rng, b=3, shape=(16, 16, 16)):
        return {
            "MRI": np.asarray(rng.standard_normal((b, *shape)), np.float32),
            "PET": np.asarray(rng.standard_normal((b, *shape)), np.float32),
            "label": np.asarray(rng.integers(0, 2, b), np.int32),
        }

    @pytest.mark.parametrize("name,modalities,adv", [
        ("single", ("MRI",), False),
        ("cnn_ad", ("MRI", "PET"), True),  # covers discriminator/head BN
    ])
    def test_padded_step_matches_short_batch(self, rng, name, modalities,
                                             adv):
        from transmf_ad_tpu.data.pipeline import pad_batch
        from transmf_ad_tpu.models import build_model

        short = self._short_batch(rng)
        padded = pad_batch(dict(short), pad_to=4)
        model = build_model(name, dim=8)
        # SGD: the param delta is -lr*grad, so this asserts gradient
        # equality directly (Adam's m/sqrt(v) amplifies ~1e-12 reduction-
        # order differences on near-zero grads into +-lr sign flips)
        tx, _ = build_optimizer("SGD", lr=1e-2, steps_per_epoch=1,
                                milestones=())
        inputs = [jnp.asarray(short[k][..., None]) for k in modalities]
        state0 = create_state(model, tx, inputs, jax.random.key(0))

        step_ref = make_train_step(modalities, adversarial=adv, aug_cfg=None,
                                   donate=False)
        step_mask = make_train_step(modalities, adversarial=adv,
                                    aug_cfg=None, donate=False, mask_bn=True)
        key = jax.random.key(1)
        st_ref, aux_ref = step_ref(state0, short, key)
        st_mask, aux_mask = step_mask(state0, padded, key)

        assert float(aux_mask["ce_loss"]) == pytest.approx(
            float(aux_ref["ce_loss"]), rel=1e-6)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_ref.batch_stats),
            jax.tree_util.tree_leaves_with_path(st_mask.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"batch_stats mismatch at {pa}")
        # f32 reduction-order noise: the 4-row vs 3-row conv-grad
        # contractions round differently (~4e-6 abs observed on cnn_ad)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_ref.params),
            jax.tree_util.tree_leaves_with_path(st_mask.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
                err_msg=f"param mismatch at {pa}")

    def test_unmasked_padded_step_deviates(self, rng):
        """Sanity: withOUT mask_bn the duplicate-padded batch perturbs the
        BN running statistics (the Weak-4 deviation this mode removes)."""
        from transmf_ad_tpu.data.pipeline import pad_batch
        from transmf_ad_tpu.models import build_model

        short = self._short_batch(rng)
        padded = pad_batch(dict(short), pad_to=4)
        model = build_model("single", dim=8)
        tx, _ = build_optimizer("Adam", lr=1e-3, steps_per_epoch=1)
        state0 = create_state(model, tx, [jnp.asarray(short["MRI"][..., None])],
                              jax.random.key(0))
        step = make_train_step(("MRI",), adversarial=False, aug_cfg=None,
                               donate=False)
        st_ref, _ = step(state0, short, jax.random.key(1))
        st_pad, _ = step(state0, padded, jax.random.key(1))
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(jax.tree_util.tree_leaves(st_ref.batch_stats),
                            jax.tree_util.tree_leaves(st_pad.batch_stats))
        ]
        assert max(diffs) > 1e-7

    def test_feeds_attach_host_n_real(self, rng, tmp_path):
        """DeviceFeed and DeviceCachedFeed attach '_n_real' as a PLAIN host
        int (never a device array), so the trainer's ragged-batch BN
        dispatch (TrainerConfig.mask_bn='ragged') costs no sync."""
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.device_cache import DeviceCachedFeed
        from transmf_ad_tpu.data.pipeline import (DeviceFeed, Loader,
                                                  VolumeSource)
        from transmf_ad_tpu.data.synthetic import make_synthetic_adni

        root = str(tmp_path / "adni")
        make_synthetic_adni(root, n_per_group=4, shape=(12, 14, 12), seed=0)
        recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
        for feed_cls in ("stream", "cached"):
            loader = Loader(VolumeSource(recs), batch_size=3, shuffle=False,
                            drop_last=False, seed=0)
            feed = (DeviceFeed(loader, depth=2, pad_to=3)
                    if feed_cls == "stream"
                    else DeviceCachedFeed(loader, mesh=None, pad_to=3))
            batches = list(feed)
            ns = [b["_n_real"] for b in batches]
            assert all(isinstance(n, int) for n in ns), feed_cls
            # 8 samples at batch 3: 3, 3, then a ragged 2
            assert ns == [3, 3, 2], (feed_cls, ns)
            assert batches[-1]["label"].shape[0] == 3  # still padded


class TestProgressBar:
    def test_non_tty_logs_periodic_lines(self):
        import io

        from transmf_ad_tpu.train.engine import Engine
        from transmf_ad_tpu.utils.progress import ProgressBar

        buf = io.StringIO()  # not a tty -> plain periodic lines
        eng = Engine(lambda e, b: b)
        ProgressBar(file=buf, log_every=2).attach(eng, total=5)
        eng.run(range(5), max_epochs=1)
        out = buf.getvalue()
        assert "Epoch [1/1] iteration 2/5" in out
        assert "iteration 4/5" in out
        assert "iteration 5/5" in out  # final iteration always logged

    def test_tty_draws_and_persists_bar(self):
        import io

        from transmf_ad_tpu.train.engine import Engine
        from transmf_ad_tpu.utils.progress import ProgressBar

        class Tty(io.StringIO):
            def isatty(self):
                return True

        buf = Tty()
        eng = Engine(lambda e, b: b)
        ProgressBar(file=buf, min_interval=0.0).attach(eng, total=3)
        eng.run(range(3), max_epochs=2)
        out = buf.getvalue()
        assert "\r" in out and "[3/3]" in out and "100%" in out
        assert out.count("\n") == 2  # persist=True: one kept line per epoch

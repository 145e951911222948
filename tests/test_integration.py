"""End-to-end integration: k-fold drivers on synthetic ADNI data (CPU).

This is BASELINE.json config 1 ("single-modality 3D-CNN MRI ADCN classifier,
synthetic ADNI-format NIfTI on CPU") plus a short adversarial-fusion run,
exercising: CSV index -> loader -> jitted train step (with augmentation) ->
engine -> metrics -> best checkpointing -> test eval -> fold aggregation.
"""

import glob
import os

import numpy as np
import pytest

from transmf_ad_tpu.config import Options
from transmf_ad_tpu.train.kfold import run_holdout, run_kfold, task_seed


def _opt(adni_root, tmp_path, **kw):
    base = dict(
        name="itest",
        dataroot=adni_root,
        checkpoints_dir=str(tmp_path / "ckpt"),
        task="ADCN",
        batch_size=4,
        stage1_epochs=1,
        stage2_epochs=1,
        dim=16,
        heads=2,
        trans_enc_depth=1,
        num_folds=3,
        aug="True",
        use_pallas="False",
    )
    base.update(kw)
    return Options(**base)


class TestKFoldSingle:
    def test_full_run(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="CNN")
        res = run_kfold(opt, variant="single")
        assert len(res["folds"]) == 3
        mean = res["mean"]
        assert len(mean) == 6
        assert 0.0 <= mean[1] <= 1.0  # accuracy
        # artifacts: per-fold dirs with logs and a best checkpoint
        fold0 = os.path.join(opt.checkpoints_dir, opt.name, "0")
        assert os.path.exists(os.path.join(fold0, "log.txt"))
        assert glob.glob(os.path.join(fold0, "best_label_net_model_*.msgpack"))
        # main log has the final aggregate in the reference format
        main_log = open(
            os.path.join(opt.checkpoints_dir, opt.name, "log.txt")
        ).read()
        assert "************Final Results************" in main_log
        assert "acc:" in main_log and "+-" in main_log

    def test_fold_subset_flag(self, adni_root, tmp_path):
        """--folds runs only the listed folds against the SAME KFold
        layout (parallelize folds across hosts / redo one fold)."""
        opt = _opt(adni_root, tmp_path, model="CNN", folds="1")
        res = run_kfold(opt, variant="single")
        assert len(res["folds"]) == 1
        root = os.path.join(opt.checkpoints_dir, opt.name)
        assert os.path.exists(os.path.join(root, "1", "log.txt"))
        assert not os.path.exists(os.path.join(root, "0"))
        assert not os.path.exists(os.path.join(root, "2"))

    def test_task_seeds_match_reference(self, adni_root):
        assert task_seed(Options(task="ADCN")) == 42
        assert task_seed(Options(task="pMCIsMCI")) == 996
        assert task_seed(Options(task="MCICN")) == 1


class TestKFoldAdversarial:
    @pytest.mark.slow
    def test_transformer_fusion_run(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="Transformer", num_folds=2,
                   batch_size=3)
        res = run_kfold(opt, variant="adversarial")
        assert len(res["folds"]) == 2
        fold0_log = open(
            os.path.join(opt.checkpoints_dir, opt.name, "0", "log.txt")
        ).read()
        # adversarial training logs discriminator accuracies
        assert "MRIaccuracy" in fold0_log and "PETaccuracy" in fold0_log
        assert "Test Results" in fold0_log


class TestHoldout:
    def test_holdout_run(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="CNN", num_folds=2)
        res = run_holdout(opt)
        assert len(res) == 6
        # partitions are saved like the reference
        d = os.path.join(opt.checkpoints_dir, opt.name)
        for f in ("train.npy", "val.npy", "test.npy"):
            assert os.path.exists(os.path.join(d, f))


class TestResume:
    def test_latest_checkpoint_resume(self, adni_root, tmp_path):
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        data = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(data, keys=("MRI",))
        tr = Loader(src, list(range(6)), 3, shuffle=True)
        va = Loader(src, [6, 7], 2)
        save_dir = str(tmp_path / "resume")
        cfg = TrainerConfig(model="single", dim=8, epochs=2, aug=False,
                            save_dir=save_dir, save_latest_every=1,
                            use_pallas=False)
        t1 = Trainer(cfg)
        t1.fit(tr, va, None)
        assert os.path.exists(os.path.join(save_dir, "latest.msgpack"))

        cfg2 = TrainerConfig(model="single", dim=8, epochs=2, aug=False,
                             save_dir=save_dir, resume=True, use_pallas=False)
        t2 = Trainer(cfg2)
        # resuming from epoch 2 of 2 -> no further training, still returns
        t2.fit(tr, va, None)
        log = open(os.path.join(save_dir, "log.txt")).read()
        assert "Resumed from epoch 2" in log

    def test_resume_restores_optimizer_state_and_step(self, adni_root,
                                                      tmp_path):
        """Continuity: 1 epoch + kill + resume + 1 epoch must produce the
        SAME parameters as 2 uninterrupted epochs — i.e. Adam moments,
        bias-correction count, the step counter and the step-indexed LR
        schedule all survive the restart (the reference cannot resume at
        all, reference: kfold_train_adversarial.py:222-233 saves params
        only)."""
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        data = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(data, keys=("MRI",))

        def loaders():
            # shuffle off: data order must match across the two runs
            return (Loader(src, list(range(6)), 3), Loader(src, [6, 7], 2))

        def cfg(save_dir, epochs, resume=False):
            return TrainerConfig(
                model="single", dim=8, epochs=epochs, aug=False, lr=1e-3,
                save_dir=save_dir, save_latest_every=1, resume=resume,
                use_pallas=False, dtype="float32", seed=7,
            )

        # Run A: 2 uninterrupted epochs.
        tr, va = loaders()
        ta = Trainer(cfg(str(tmp_path / "a"), epochs=2))
        ta.fit(tr, va, None)

        # Run B: 1 epoch, "crash", new process-equivalent Trainer resumes.
        tr, va = loaders()
        tb1 = Trainer(cfg(str(tmp_path / "b"), epochs=1))
        tb1.fit(tr, va, None)
        tr, va = loaders()
        tb2 = Trainer(cfg(str(tmp_path / "b"), epochs=2, resume=True))
        tb2.fit(tr, va, None)

        assert int(tb2.state.step) == int(ta.state.step)
        flat_a = jax.tree_util.tree_leaves(ta.state.params)
        flat_b = jax.tree_util.tree_leaves(tb2.state.params)
        for pa, pb in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        # optimizer moments themselves continue identically too
        for ma, mb in zip(jax.tree_util.tree_leaves(ta.state.opt_state),
                          jax.tree_util.tree_leaves(tb2.state.opt_state)):
            np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


class TestHoldoutModes:
    def test_adni12_mode(self, adni_root, tmp_path):
        # ADNI12: train on ADNI1 CSV, test on ADNI2 CSV
        import shutil

        shutil.copy(os.path.join(adni_root, "ADNI.csv"),
                    os.path.join(adni_root, "ADNI1_modality_complete.csv"))
        shutil.copy(os.path.join(adni_root, "ADNI.csv"),
                    os.path.join(adni_root, "ADNI2_modality_complete.csv"))
        opt = _opt(adni_root, tmp_path, model="CNN", dataset="ADNI12",
                   stage1_epochs=1, stage2_epochs=0)
        res = run_holdout(opt)
        assert len(res) == 6

    def test_pretrain_mode(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="CNN", task="pretrain",
                   stage1_epochs=1, stage2_epochs=0)
        res = run_holdout(opt)
        assert res is None  # no test set in pretrain mode


class TestClassWeights:
    def test_weighted_training_runs(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="CNN", num_folds=2,
                   use_class_weights="True")
        res = run_kfold(opt, variant="single")
        assert len(res["folds"]) == 2


class TestTrainerDataParallel:
    def test_dp_trainer_on_virtual_mesh(self, adni_root, tmp_path):
        import jax

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        data = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(data)
        tr = Loader(src, list(range(6)), 2, shuffle=True, drop_last=True)
        va = Loader(src, [6, 7], 2)
        cfg = TrainerConfig(model="cnn_ad", dim=8, epochs=1, aug=True,
                            save_dir=str(tmp_path / "dp"), use_pallas=False,
                            data_parallel=True, model_parallel=2)
        t = Trainer(cfg)
        assert t.mesh is not None and t.mesh.shape == {"data": 4, "model": 2}
        res = t.fit(tr, va, va)
        assert len(res) == 6 and np.isfinite(res[0])
        # pad-and-mask eval: every batch (incl. ragged finals) is padded to
        # ONE fixed, mesh-shardable shape, so evaluating a loader with a
        # ragged final batch (sizes 2,1) adds ZERO new eval executables
        n_exec = t._eval_step._cache_size()
        ragged = Loader(src, [5, 6, 7], 2)
        m = t.evaluate(ragged)
        assert np.isfinite(m["loss"]) and float(m["confusion"].sum()) == 3
        assert t._eval_step._cache_size() == n_exec


class TestEvaluateCLI:
    def test_evaluate_from_checkpoint(self, adni_root, tmp_path):
        import subprocess
        import sys

        # train one tiny fold to produce a checkpoint
        opt = _opt(adni_root, tmp_path, model="CNN", num_folds=2,
                   stage1_epochs=1, stage2_epochs=0)
        run_kfold(opt, variant="adversarial")
        ckpt_glob = os.path.join(opt.checkpoints_dir, opt.name, "0",
                                 "best_label_net_model_*.msgpack")
        assert glob.glob(ckpt_glob)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "evaluate.py",
             "--checkpoint", ckpt_glob,
             "--name", opt.name, "--task", "ADCN", "--model", "CNN",
             "--dataroot", adni_root,
             "--checkpoints_dir", opt.checkpoints_dir,
             "--dim", "16", "--heads", "2", "--trans_enc_depth", "1",
             "--use_pallas", "False", "--dtype", "float32",
             "--batch_size", "4"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "accuracy:" in out.stdout

    @pytest.mark.slow
    def test_evaluate_from_torch_checkpoint(self, adni_root, tmp_path):
        """A reference-trained torch `.pt` evaluates directly:
        evaluate.py --checkpoint x.pt routes through
        utils/torch_import.py (reference users' checkpoints carry over
        without a conversion step)."""
        import subprocess
        import sys

        torch = pytest.importorskip("torch")
        ref = os.environ.get("REFERENCE_PATH", "/root/reference")
        if not os.path.isdir(ref):
            pytest.skip("reference checkout not available")
        sys.path.insert(0, ref)
        from models.mymodel import model_CNN_ad

        torch.manual_seed(3)
        path = str(tmp_path / "ref_cnn_ad.pt")
        torch.save({"net_model": model_CNN_ad(dim=16).state_dict()}, path)

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "evaluate.py",
             "--checkpoint", path,
             "--name", "torch_eval", "--task", "ADCN", "--model", "CNN",
             "--dataroot", adni_root,
             "--checkpoints_dir", str(tmp_path / "ckpt"),
             "--dim", "16", "--heads", "2", "--trans_enc_depth", "1",
             "--use_pallas", "False", "--dtype", "float32",
             "--batch_size", "4"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, (out.stdout + out.stderr)[-2000:]
        assert "accuracy:" in out.stdout


class TestKFoldVariants:
    """ADVIT and Mnet driver variants end-to-end (tiny synthetic volumes,
    padded to each variant's geometry)."""

    @pytest.mark.slow
    def test_advit_variant(self, adni_root, tmp_path):
        opt = _opt(adni_root, tmp_path, model="Transformer", num_folds=2,
                   batch_size=3, stage1_epochs=1, stage2_epochs=0)
        # pad depth to 79 (the DepthCollapse geometry); small plane for CPU
        res = run_kfold(opt, variant="advit", pad_to_override=(32, 32, 79))
        assert len(res["folds"]) == 2
        log = open(os.path.join(opt.checkpoints_dir, opt.name, "0",
                                "log.txt")).read()
        assert "Test Results" in log

    @pytest.mark.slow
    def test_mnet_variant_eval_path(self, adni_root, tmp_path):
        # Full (91,109,91) geometry: compiling Mnet's fwd+bwd takes ~7 min
        # on this 1-core CPU, so the driver e2e covers the eval/test path
        # (batch > train-set size with drop_last leaves zero train
        # batches); the TRAIN path executes for real at reduced geometry
        # in test_mnet_train_step_runs below.
        opt = _opt(adni_root, tmp_path, model="CNN", num_folds=2,
                   batch_size=8, stage1_epochs=1, stage2_epochs=0)
        res = run_kfold(opt, variant="mnet")
        assert len(res["folds"]) == 2
        assert np.isfinite(res["folds"][0][0])

    @pytest.mark.slow
    def test_mnet_train_step_runs(self, adni_root, tmp_path):
        """Compile AND execute Mnet fwd+bwd+SGD for a full (tiny) epoch.

        Geometry (25,31,25): odd dims with L % 3 == 1 so every slice
        branch collapses its axis to exactly 1 like the reference's
        (91,109,91); reduced spatial stack (kernel 3, pool 2) keeps the
        1-core CPU compile in seconds."""
        import jax

        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        data = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(data, pad_to=(25, 31, 25))
        tr = Loader(src, list(range(6)), 3, shuffle=True, drop_last=True)
        va = Loader(src, [6, 7], 2)
        cfg = TrainerConfig(
            model="mnet", epochs=2, aug=True, optimizer="SGD", lr=1e-3,
            momentum=0.9, milestones=(6, 21),  # the Mnet driver recipe
            save_dir=str(tmp_path / "mnet_train"), use_pallas=False,
            dtype="float32",
            model_kwargs={"spatial_kernel": 3, "spatial_pool": 2},
        )
        t = Trainer(cfg)
        sample = tr.peek()
        t.init_state(sample, steps_per_epoch=len(tr))
        before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                        t.state.params)
        res = t.fit(tr, va, va)
        assert len(res) == 6 and np.isfinite(res[0])
        assert int(t.state.step) == 4  # 2 epochs x 2 full batches
        # SGD actually moved the slice/spatial conv weights
        moved = [
            not np.allclose(np.asarray(a), b, atol=1e-12)
            for a, b in zip(jax.tree_util.tree_leaves(t.state.params),
                            jax.tree_util.tree_leaves(before))
        ]
        assert any(moved)
        log = open(os.path.join(str(tmp_path / "mnet_train"),
                                "log.txt")).read()
        assert "Training Results - Epoch[2]" in log

    def test_mnet_grad_structure(self, rng):
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import Mnet

        m = Mnet()
        mri = jax.ShapeDtypeStruct((2, 91, 109, 91, 1), jnp.float32)
        variables = jax.eval_shape(m.init, jax.random.key(0), mri, mri)

        def loss(params, batch_stats, mri, pet):
            out = m.apply({"params": params, "batch_stats": batch_stats},
                          mri, pet)
            return jnp.sum(out)

        grads = jax.eval_shape(jax.grad(loss), variables["params"],
                               variables["batch_stats"], mri, mri)
        # every parameter receives a gradient of its own shape
        p_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                          variables["params"])
        g_shapes = jax.tree_util.tree_map(lambda x: x.shape, grads)
        assert p_shapes == g_shapes


class TestLearnability:
    @pytest.mark.slow
    def test_single_model_learns_synthetic_task(self, adni_root, tmp_path):
        """The synthetic fixture is learnable (class-dependent blob size);
        a small sNet must beat chance on train data within a few epochs —
        guards against silent breakage in grads/optimizer/augmentation."""
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig

        data = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(data)
        tr = Loader(src, list(range(8)), 4, shuffle=True, seed=0)
        cfg = TrainerConfig(model="single", dim=8, epochs=40, aug=False,
                            lr=1e-3, save_dir=str(tmp_path / "learn"),
                            use_pallas=False, seed=3)
        t = Trainer(cfg)
        t.fit(tr, tr, None)  # validate on train: memorization check
        metrics = t.evaluate(tr)
        assert metrics["accuracy"] >= 0.75, metrics

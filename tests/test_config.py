"""CLI options: parsing, defaults, opt.txt snapshot, string bools."""

import os

from transmf_ad_tpu.config import Option, Options, str2bool


class TestOptions:
    def test_defaults_match_reference(self):
        o = Options()
        # reference defaults (reference: options/option.py:19-40)
        assert o.batch_size == 2 and o.lr == 1e-4 and o.dim == 128
        assert o.task == "ADCN" and o.optimizer == "Adam"
        assert o.stage1_epochs == 20 and o.stage2_epochs == 20
        assert o.epochs == 40
        assert o.aug == "True" and o.aug_bool is True

    def test_string_bools(self):
        assert str2bool("True") and not str2bool("False")
        assert not str2bool("true")  # reference compares == 'True' exactly

    def test_parse_writes_opt_txt(self, tmp_path):
        opt = Option().parse([
            "--name", "exp1", "--task", "pMCIsMCI", "--batch_size", "8",
            "--checkpoints_dir", str(tmp_path), "--aug", "False",
        ])
        assert opt.task == "pMCIsMCI" and opt.batch_size == 8
        assert opt.aug_bool is False
        txt = open(os.path.join(str(tmp_path), "exp1", "opt.txt")).read()
        assert "----------------- Options ---------------" in txt
        assert "task: pMCIsMCI" in txt.replace("  ", " ").replace("  ", " ") or \
            "pMCIsMCI" in txt
        assert "[default: ADCN]" in txt  # changed values annotated

    def test_use_pallas_tristate(self):
        assert Options().use_pallas_opt is None
        assert Options(use_pallas="True").use_pallas_opt is True
        assert Options(use_pallas="False").use_pallas_opt is False


class TestPipelineEdgeCases:
    def test_loader_propagates_decode_errors(self, tmp_path):
        from transmf_ad_tpu.data.pipeline import Loader, VolumeSource

        bad = [{"MRI": str(tmp_path / "missing.nii.gz"),
                "PET": str(tmp_path / "missing.nii.gz"), "label": 0}]
        src = VolumeSource(bad)
        import pytest

        with pytest.raises(Exception):
            list(Loader(src, batch_size=1))

    def test_device_prefetch_order_and_sharding(self, adni_root):
        import numpy as np

        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import (
            Loader, VolumeSource, device_prefetch)

        recs = ADNI(adni_root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs)
        loader = Loader(src, batch_size=2, shuffle=False, drop_last=True)
        direct = [b["label"].tolist() for b in loader]
        prefetched = [
            np.asarray(b["label"]).tolist()
            for b in device_prefetch(loader, depth=2)
        ]
        assert prefetched == direct

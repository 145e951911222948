"""Full-model numerical parity vs the PyTorch reference.

BASELINE.json's north star: "output logits/metrics match the PyTorch
reference within tolerance". This test imports the reference implementation
from /root/reference at runtime (no code copied), maps our ModelAd
parameters into the torch model_ad's state_dict, and asserts eval-mode
logits (classifier + both discriminator heads) agree on random volumes.
Skipped when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

DIM, DEPTH, HEADS = 16, 1, 2
SHAPE = (24, 28, 24)


def _to_torch_linear(t, kernel, bias=None):
    import torch

    t.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())
    if bias is not None:
        t.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _to_torch_conv(t, kernel, bias):
    import torch

    # (D,H,W,I,O) -> (O,I,D,H,W)
    t.weight.data = torch.from_numpy(
        np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())
    t.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _to_torch_bn(t, p, stats):
    import torch

    t.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    t.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    t.running_mean.data = torch.from_numpy(np.asarray(stats["mean"]).copy())
    t.running_var.data = torch.from_numpy(np.asarray(stats["var"]).copy())


def _load_snet(torch_snet, params, stats):
    # our ConvBNAct_0..6 <-> torch conv1..conv4 Sequential slots
    slots = [  # (torch sequential, conv idx, bn idx)
        (torch_snet.conv1, 0, 1),
        (torch_snet.conv2, 0, 1), (torch_snet.conv2, 3, 4),
        (torch_snet.conv3, 0, 1), (torch_snet.conv3, 3, 4),
        (torch_snet.conv4, 0, 1), (torch_snet.conv4, 3, 4),
    ]
    for i, (seq, ci, bi) in enumerate(slots):
        blk = f"ConvBNAct_{i}"
        _to_torch_conv(seq[ci], params[blk]["kernel"], params[blk]["bias"])
        _to_torch_bn(seq[bi], params[blk]["BatchNorm_0"],
                     stats[blk]["BatchNorm_0"])


def _load_transformer(torch_tr, params, stats, name):
    p = params[name]
    prenorm_attn = torch_tr.layers[0][0]
    prenorm_ff = torch_tr.layers[0][1]
    _to_torch_linear(prenorm_attn.fn.to_q, p["Attention_0"]["to_q"]["kernel"])
    _to_torch_linear(prenorm_attn.fn.to_kv, p["Attention_0"]["to_kv"]["kernel"])
    _to_torch_linear(prenorm_attn.fn.to_out[0],
                     p["Attention_0"]["to_out"]["kernel"],
                     p["Attention_0"]["to_out"]["bias"])
    for ln, key in ((prenorm_attn.norm, "LayerNorm_0"),
                    (prenorm_ff.norm, "LayerNorm_1"),
                    (torch_tr.norm, "LayerNorm_2")):
        import torch

        ln.weight.data = torch.from_numpy(np.asarray(p[key]["scale"]).copy())
        ln.bias.data = torch.from_numpy(np.asarray(p[key]["bias"]).copy())
    ff = p["FeedForward_0"]
    _to_torch_linear(prenorm_ff.fn.net[0], ff["Dense_0"]["kernel"],
                     ff["Dense_0"]["bias"])
    _to_torch_linear(prenorm_ff.fn.net[3], ff["Dense_1"]["kernel"],
                     ff["Dense_1"]["bias"])


class TestModelAdParity:
    def test_eval_logits_match_reference(self, rng):
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_ad  # runtime reference import

        ours = build_model("ad", dim=DIM, depth=DEPTH, heads=HEADS,
                           use_pallas=False, precision="highest")
        mri = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        pet = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        variables = ours.init(jax.random.key(0),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_ad(dim=DIM, depth=DEPTH, heads=HEADS,
                          dim_head=DIM // HEADS, mlp_dim=DIM * 4, dropout=0)
        theirs.eval()
        with torch.no_grad():
            for mod, cnn in (("mri_cnn", theirs.mri_cnn),
                             ("pet_cnn", theirs.pet_cnn)):
                _load_snet(cnn, params[mod], stats[mod])
            ft = theirs.fuse_transformer
            _load_transformer(ft.layers[0][0],
                              params["fuse_transformer"],
                              stats.get("fuse_transformer", {}),
                              "Transformer_0")
            _load_transformer(ft.layers[0][1],
                              params["fuse_transformer"],
                              stats.get("fuse_transformer", {}),
                              "Transformer_1")
            _to_torch_linear(theirs.D[0], params["D"]["Dense_0"]["kernel"],
                             params["D"]["Dense_0"]["bias"])
            _to_torch_bn(theirs.D[1], params["D"]["BatchNorm_0"],
                         stats["D"]["BatchNorm_0"])
            _to_torch_linear(theirs.D[3], params["D"]["Dense_1"]["kernel"],
                             params["D"]["Dense_1"]["bias"])
            fc = params["fc_cls"]
            fcs = stats["fc_cls"]
            _to_torch_linear(theirs.fc_cls[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_bn(theirs.fc_cls[1], fc["BatchNorm_0"],
                         fcs["BatchNorm_0"])
            _to_torch_linear(theirs.fc_cls[4], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            _to_torch_bn(theirs.fc_cls[5], fc["BatchNorm_1"],
                         fcs["BatchNorm_1"])
            _to_torch_linear(theirs.fc_cls[8], fc["Dense_2"]["kernel"],
                             fc["Dense_2"]["bias"])

            t_logits, t_dmri, t_dpet = theirs(
                torch.from_numpy(mri).unsqueeze(1),
                torch.from_numpy(pet).unsqueeze(1),
            )

        j_logits, j_dmri, j_dpet = ours.apply(
            variables, jnp.asarray(mri[..., None]), jnp.asarray(pet[..., None]),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(j_dmri), t_dmri.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(j_dpet), t_dpet.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestModelSingleParity:
    def test_eval_logits_match_reference(self, rng):
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_single

        # reference model_single hard-codes fc Linear(128, 64) -> dim=128;
        # use a reduced spatial shape to keep CPU time low
        dim = 128
        ours = build_model("single", dim=dim, use_pallas=False,
                           precision="highest")
        img = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
        variables = ours.init(jax.random.key(1), jnp.asarray(img[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_single(dim=dim)
        theirs.eval()
        with torch.no_grad():
            _load_snet(theirs.cnn, params["cnn"], stats["cnn"])
            _to_torch_linear(theirs.fc[0], params["fc"]["Dense_0"]["kernel"],
                             params["fc"]["Dense_0"]["bias"])
            _to_torch_linear(theirs.fc[2], params["fc"]["Dense_1"]["kernel"],
                             params["fc"]["Dense_1"]["bias"])
            t_logits = theirs(torch.from_numpy(img).unsqueeze(1))

        j_logits = ours.apply(variables, jnp.asarray(img[..., None]),
                              train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


def _load_deep_transformer(torch_tr, p, depth):
    """Map our Transformer params (depth layers) into the reference's
    networks.Transformer (reference: models/networks.py:215-230)."""
    import torch

    for i in range(depth):
        pn_attn, pn_ff = torch_tr.layers[i][0], torch_tr.layers[i][1]
        a = p[f"Attention_{i}"]
        _to_torch_linear(pn_attn.fn.to_q, a["to_q"]["kernel"])
        _to_torch_linear(pn_attn.fn.to_kv, a["to_kv"]["kernel"])
        _to_torch_linear(pn_attn.fn.to_out[0], a["to_out"]["kernel"],
                         a["to_out"]["bias"])
        for ln, key in ((pn_attn.norm, f"LayerNorm_{2 * i}"),
                        (pn_ff.norm, f"LayerNorm_{2 * i + 1}")):
            ln.weight.data = torch.from_numpy(np.asarray(p[key]["scale"]).copy())
            ln.bias.data = torch.from_numpy(np.asarray(p[key]["bias"]).copy())
        ff = p[f"FeedForward_{i}"]
        _to_torch_linear(pn_ff.fn.net[0], ff["Dense_0"]["kernel"],
                         ff["Dense_0"]["bias"])
        _to_torch_linear(pn_ff.fn.net[3], ff["Dense_1"]["kernel"],
                         ff["Dense_1"]["bias"])
    fin = p[f"LayerNorm_{2 * depth}"]
    torch_tr.norm.weight.data = torch.from_numpy(
        np.asarray(fin["scale"]).copy())
    torch_tr.norm.bias.data = torch.from_numpy(np.asarray(fin["bias"]).copy())


class TestADVITParity:
    """Numerical anchor for C11. vit_pytorch is unavailable (and the
    reference forward is internally inconsistent with it — see
    transmf_ad_tpu/models/advit.py:8-19), so the oracle is hand-built in
    torch: the reference's to-2d stacks verbatim (models/ADVIT.py:10-29)
    plus the documented ViT interpretation (vit_pytorch patch-embed
    LN->Linear->LN, cls token, learned pos embedding, CLS latent) expressed
    with the reference's OWN networks.Transformer, and Linear(384,2)."""

    def test_eval_logits_match_handbuilt_reference(self, rng):
        import torch
        import torch.nn as tnn

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.networks import Transformer as TorchTransformer

        H = W = 32  # plane reduced from 128 (2x2 grid of 16-patches); D real
        D = 79
        DIM, DEPTH_V, HEADS_V, MLP = 192, 6, 3, 768

        ours = build_model("advit", use_pallas=False, precision="highest")
        mri = rng.standard_normal((2, H, W, D)).astype(np.float32)
        pet = rng.standard_normal((2, H, W, D)).astype(np.float32)
        variables = ours.init(jax.random.key(4),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        def torch_to2d():
            # reference to_2d stack (models/ADVIT.py:10-29)
            return tnn.Sequential(
                tnn.Conv3d(1, 32, (1, 1, 25)), tnn.BatchNorm3d(32), tnn.ReLU(),
                tnn.MaxPool3d((1, 1, 2), (1, 1, 2)),
                tnn.Conv3d(32, 1, (1, 1, 25)), tnn.BatchNorm3d(1), tnn.ReLU(),
                tnn.MaxPool3d((1, 1, 2), (1, 1, 2)),
            )

        class TorchViT(tnn.Module):
            def __init__(self, patch=16):
                super().__init__()
                self.patch = patch
                n_patches = (H // patch) * (W // patch)
                self.norm_in = tnn.LayerNorm(patch * patch)
                self.proj = tnn.Linear(patch * patch, DIM)
                self.norm_out = tnn.LayerNorm(DIM)
                self.cls = tnn.Parameter(torch.zeros(1, 1, DIM))
                self.pos = tnn.Parameter(torch.zeros(1, n_patches + 1, DIM))
                self.tr = TorchTransformer(DIM, DEPTH_V, HEADS_V,
                                           DIM // HEADS_V, MLP, 0.0)

            def forward(self, img):  # (B, 1, H, W)
                b, c, h, w = img.shape
                p = self.patch
                x = img.reshape(b, c, h // p, p, w // p, p)
                x = x.permute(0, 2, 4, 3, 5, 1).reshape(
                    b, (h // p) * (w // p), p * p * c)
                x = self.norm_out(self.proj(self.norm_in(x)))
                x = torch.cat([self.cls.expand(b, -1, -1), x], 1) + self.pos
                return self.tr(x)[:, 0]

        def load_to2d(seq, p, s):
            for i, (ci, bi) in enumerate(((0, 1), (4, 5))):
                blk = f"ConvBNAct_{i}"
                _to_torch_conv(seq[ci], p[blk]["kernel"], p[blk]["bias"])
                _to_torch_bn(seq[bi], p[blk]["BatchNorm_0"],
                             s[blk]["BatchNorm_0"])

        def load_vit(tv, p):
            for ln, key in ((tv.norm_in, "LayerNorm_0"),
                            (tv.norm_out, "LayerNorm_1")):
                ln.weight.data = torch.from_numpy(
                    np.asarray(p[key]["scale"]).copy())
                ln.bias.data = torch.from_numpy(
                    np.asarray(p[key]["bias"]).copy())
            _to_torch_linear(tv.proj, p["Dense_0"]["kernel"],
                             p["Dense_0"]["bias"])
            tv.cls.data = torch.from_numpy(np.asarray(p["cls_token"]).copy())
            tv.pos.data = torch.from_numpy(
                np.asarray(p["pos_embedding"]).copy())
            _load_deep_transformer(tv.tr, p["Transformer_0"], DEPTH_V)

        to2d_mri, to2d_pet = torch_to2d(), torch_to2d()
        vit_mri, vit_pet = TorchViT(), TorchViT()
        fc = tnn.Linear(2 * DIM, 2)
        for m in (to2d_mri, to2d_pet, vit_mri, vit_pet, fc):
            m.eval()
        with torch.no_grad():
            load_to2d(to2d_mri, params["to_2d_mri"], stats["to_2d_mri"])
            load_to2d(to2d_pet, params["to_2d_pet"], stats["to_2d_pet"])
            load_vit(vit_mri, params["vit_mri"])
            load_vit(vit_pet, params["vit_pet"])
            _to_torch_linear(fc, params["fc"]["kernel"], params["fc"]["bias"])

            def run(to2d, vit, img):
                out = to2d(torch.from_numpy(img).unsqueeze(1))  # (B,1,H,W,1)
                out = out.reshape(out.shape[0], 1, H, W)  # 'b c h w d->b c h (w d)'
                return vit(out)

            lat = torch.cat([run(to2d_mri, vit_mri, mri),
                             run(to2d_pet, vit_pet, pet)], dim=-1)
            t_logits = fc(lat)

        j_logits = ours.apply(variables, jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]), train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestMnetParity:
    @pytest.mark.slow
    def test_eval_logits_match_reference(self, rng):
        """Mnet at the FULL reference geometry (91,109,91): map every
        slice/spatial conv + BN and the fc head into the torch reference
        (reference: models/MiSePyNet.py:97-163) and compare eval logits.
        The torch spatial_cnn applies conv1 to all three slice branches
        (conv2/conv3 are dead) — our shared _StridedStack matches that."""
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.MiSePyNet import Mnet as TorchMnet

        ours = build_model("mnet", use_pallas=False, precision="highest")
        mri = rng.standard_normal((1, 91, 109, 91)).astype(np.float32)
        pet = rng.standard_normal((1, 91, 109, 91)).astype(np.float32)
        variables = ours.init(jax.random.key(3),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = TorchMnet()
        theirs.eval()

        def load_slice(seq_parent, p, s):
            # our ConvBNAct_0..5 <-> torch conv1[0,1]; conv2[0,1],[3,4];
            # conv3[0,1],[3,4],[6,7]
            slots = [
                (seq_parent.conv1, 0, 1),
                (seq_parent.conv2, 0, 1), (seq_parent.conv2, 3, 4),
                (seq_parent.conv3, 0, 1), (seq_parent.conv3, 3, 4),
                (seq_parent.conv3, 6, 7),
            ]
            for i, (seq, ci, bi) in enumerate(slots):
                blk = f"ConvBNAct_{i}"
                _to_torch_conv(seq[ci], p[blk]["kernel"], p[blk]["bias"])
                _to_torch_bn(seq[bi], p[blk]["BatchNorm_0"],
                             s[blk]["BatchNorm_0"])

        def load_spatial(seq_parent, p, s):
            # shared _StridedStack_0: ConvBNAct_0..2 <-> torch conv1
            # indices (0,1), (4,5), (8,9)
            st_p, st_s = p["_StridedStack_0"], s["_StridedStack_0"]
            for i, (ci, bi) in enumerate(((0, 1), (4, 5), (8, 9))):
                blk = f"ConvBNAct_{i}"
                _to_torch_conv(seq_parent.conv1[ci], st_p[blk]["kernel"],
                               st_p[blk]["bias"])
                _to_torch_bn(seq_parent.conv1[bi], st_p[blk]["BatchNorm_0"],
                             st_s[blk]["BatchNorm_0"])

        with torch.no_grad():
            for mod, t_net in (("mri", theirs.mri), ("pet", theirs.pet)):
                for view in ("axial", "col", "sag"):
                    load_slice(getattr(t_net, f"slice_cnn_{view}"),
                               params[mod][f"slice_{view}"],
                               stats[mod][f"slice_{view}"])
                    load_spatial(getattr(t_net, f"spatial_cnn_{view}"),
                                 params[mod][f"spatial_{view}"],
                                 stats[mod][f"spatial_{view}"])
            fc, fcs = params, stats
            _to_torch_linear(theirs.fc[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_bn(theirs.fc[1], fc["BatchNorm_0"], fcs["BatchNorm_0"])
            _to_torch_linear(theirs.fc[4], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            _to_torch_bn(theirs.fc[5], fc["BatchNorm_1"], fcs["BatchNorm_1"])
            _to_torch_linear(theirs.fc[8], fc["Dense_2"]["kernel"],
                             fc["Dense_2"]["bias"])
            t_logits = theirs(torch.from_numpy(mri).unsqueeze(1),
                              torch.from_numpy(pet).unsqueeze(1))

        j_logits = ours.apply(variables, jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]), train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestModelCNNAdParity:
    def test_eval_logits_match_reference(self, rng):
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_CNN_ad

        dim = 16
        ours = build_model("cnn_ad", dim=dim, use_pallas=False,
                           precision="highest")
        mri = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        pet = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        variables = ours.init(jax.random.key(2),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_CNN_ad(dim=dim)
        theirs.eval()
        with torch.no_grad():
            _load_snet(theirs.mri_cnn, params["mri_cnn"], stats["mri_cnn"])
            _load_snet(theirs.pet_cnn, params["pet_cnn"], stats["pet_cnn"])
            _to_torch_linear(theirs.D[0], params["D"]["Dense_0"]["kernel"],
                             params["D"]["Dense_0"]["bias"])
            _to_torch_bn(theirs.D[1], params["D"]["BatchNorm_0"],
                         stats["D"]["BatchNorm_0"])
            _to_torch_linear(theirs.D[3], params["D"]["Dense_1"]["kernel"],
                             params["D"]["Dense_1"]["bias"])
            fc = params["fc_cls"]
            _to_torch_linear(theirs.fc_cls[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_linear(theirs.fc_cls[2], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            t_logits, t_dmri, t_dpet = theirs(
                torch.from_numpy(mri).unsqueeze(1),
                torch.from_numpy(pet).unsqueeze(1),
            )

        j_logits, j_dmri, j_dpet = ours.apply(
            variables, jnp.asarray(mri[..., None]), jnp.asarray(pet[..., None]),
            train=False,
        )
        for a, b in ((j_logits, t_logits), (j_dmri, t_dmri), (j_dpet, t_dpet)):
            np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                       atol=2e-4, rtol=1e-3)


class TestModelCNNParity:
    def test_eval_logits_match_reference(self, rng):
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_CNN

        dim = 16
        ours = build_model("cnn", dim=dim, use_pallas=False,
                           precision="highest")
        mri = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        pet = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        variables = ours.init(jax.random.key(5),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_CNN(dim=dim)
        theirs.eval()
        with torch.no_grad():
            _load_snet(theirs.mri_cnn, params["mri_cnn"], stats["mri_cnn"])
            _load_snet(theirs.pet_cnn, params["pet_cnn"], stats["pet_cnn"])
            fc = params["fc"]
            _to_torch_linear(theirs.fc[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_linear(theirs.fc[2], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            t_logits = theirs(torch.from_numpy(mri).unsqueeze(1),
                              torch.from_numpy(pet).unsqueeze(1))

        j_logits = ours.apply(variables, jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]), train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestModelTransformerParity:
    def test_eval_logits_match_reference(self, rng):
        """model_transformer (reference: models/mymodel.py:69-98): dual
        sNets -> CrossTransformer_MOD_AVG fusion -> BN'd 4*dim head."""
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_transformer

        ours = build_model("transformer", dim=DIM, depth=DEPTH, heads=HEADS,
                           use_pallas=False, precision="highest")
        mri = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        pet = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        variables = ours.init(jax.random.key(6),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_transformer(dim=DIM, depth=DEPTH, heads=HEADS,
                                   dim_head=DIM // HEADS, mlp_dim=DIM * 4,
                                   dropout=0)
        theirs.eval()
        with torch.no_grad():
            _load_snet(theirs.mri_cnn, params["mri_cnn"], stats["mri_cnn"])
            _load_snet(theirs.pet_cnn, params["pet_cnn"], stats["pet_cnn"])
            ft = theirs.fuse_transformer
            _load_transformer(ft.layers[0][0], params["fuse_transformer"],
                              stats.get("fuse_transformer", {}),
                              "Transformer_0")
            _load_transformer(ft.layers[0][1], params["fuse_transformer"],
                              stats.get("fuse_transformer", {}),
                              "Transformer_1")
            fc, fcs = params["fc_cls"], stats["fc_cls"]
            _to_torch_linear(theirs.fc_cls[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_bn(theirs.fc_cls[1], fc["BatchNorm_0"],
                         fcs["BatchNorm_0"])
            _to_torch_linear(theirs.fc_cls[4], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            _to_torch_bn(theirs.fc_cls[5], fc["BatchNorm_1"],
                         fcs["BatchNorm_1"])
            _to_torch_linear(theirs.fc_cls[8], fc["Dense_2"]["kernel"],
                             fc["Dense_2"]["bias"])
            t_logits = theirs(torch.from_numpy(mri).unsqueeze(1),
                              torch.from_numpy(pet).unsqueeze(1))

        j_logits = ours.apply(variables, jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]), train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestModelTransformerResParity:
    def test_eval_logits_match_reference(self, rng):
        """model_transformer_res (reference: models/mymodel.py:101-141):
        joint-context CrossTransformer, outer residual, GAP-only concat
        (the reference's gmp branch is dead code), BN-free 2*dim head."""
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_transformer_res

        ours = build_model("transformer_res", dim=DIM, depth=DEPTH,
                           heads=HEADS, use_pallas=False, precision="highest")
        mri = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        pet = rng.standard_normal((2, *SHAPE)).astype(np.float32)
        variables = ours.init(jax.random.key(7),
                              jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]))
        params, stats = variables["params"], variables["batch_stats"]

        theirs = model_transformer_res(dim=DIM, depth=DEPTH, heads=HEADS,
                                       dim_head=DIM // HEADS, mlp_dim=DIM * 4,
                                       dropout=0)
        theirs.eval()
        with torch.no_grad():
            _load_snet(theirs.mri_cnn, params["mri_cnn"], stats["mri_cnn"])
            _load_snet(theirs.pet_cnn, params["pet_cnn"], stats["pet_cnn"])
            # CrossTransformer share=False: per depth-layer a [mri, pet]
            # pair of 1-layer Transformers (ours: Transformer_{2i,2i+1})
            for i, pair in enumerate(theirs.fuse_transformer.layers):
                _load_transformer(pair[0], params["fuse_transformer"],
                                  stats.get("fuse_transformer", {}),
                                  f"Transformer_{2 * i}")
                _load_transformer(pair[1], params["fuse_transformer"],
                                  stats.get("fuse_transformer", {}),
                                  f"Transformer_{2 * i + 1}")
            fc = params["fc_cls"]
            _to_torch_linear(theirs.fc_cls[0], fc["Dense_0"]["kernel"],
                             fc["Dense_0"]["bias"])
            _to_torch_linear(theirs.fc_cls[3], fc["Dense_1"]["kernel"],
                             fc["Dense_1"]["bias"])
            _to_torch_linear(theirs.fc_cls[6], fc["Dense_2"]["kernel"],
                             fc["Dense_2"]["bias"])
            t_logits = theirs(torch.from_numpy(mri).unsqueeze(1),
                              torch.from_numpy(pet).unsqueeze(1))

        j_logits = ours.apply(variables, jnp.asarray(mri[..., None]),
                              jnp.asarray(pet[..., None]), train=False)
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestTorchCheckpointImport:
    """Round-trip for utils/torch_import.py: a torch checkpoint of the
    reference model (random torch-default init — i.e. weights the flax
    model could never have produced) imported into the flax model must
    yield matching eval logits. Covers the ignite single-object container
    ({'net_model': sd}) and the pretrain-load use case
    (reference: kfold_train_adversarial.py:80-83)."""

    @pytest.mark.parametrize("name,ref_name,dual", [
        ("single", "model_single", False),
        ("cnn_ad", "model_CNN_ad", True),
        ("ad", "model_ad", True),
        ("transformer_res", "model_transformer_res", True),
    ])
    def test_roundtrip_eval_logits(self, rng, tmp_path, name, ref_name,
                                   dual):
        import importlib

        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.utils.torch_import import import_torch_checkpoint

        sys.path.insert(0, REFERENCE)
        mymodel = importlib.import_module("models.mymodel")
        ref_cls = getattr(mymodel, ref_name)

        dim = 128 if name == "single" else DIM  # reference fc hardcodes 128
        kwargs = ({"dim": dim} if name in ("single", "cnn_ad") else
                  {"dim": dim, "depth": DEPTH, "heads": HEADS,
                   "dim_head": dim // HEADS, "mlp_dim": dim * 4,
                   "dropout": 0})
        torch.manual_seed(7)
        theirs = ref_cls(**kwargs)
        theirs.eval()
        path = tmp_path / "pretrain.pt"
        torch.save({"net_model": theirs.state_dict()}, path)

        ours_kwargs = ({"dim": dim} if name in ("single", "cnn_ad")
                       else {"dim": dim, "depth": DEPTH, "heads": HEADS})
        ours = build_model(name, use_pallas=False, precision="highest",
                           **ours_kwargs)
        shape = (16, 16, 16) if name == "single" else SHAPE
        mri = rng.standard_normal((2, *shape)).astype(np.float32)
        pet = rng.standard_normal((2, *shape)).astype(np.float32)
        inputs = ([jnp.asarray(mri[..., None])] if not dual else
                  [jnp.asarray(mri[..., None]), jnp.asarray(pet[..., None])])
        variables = ours.init(jax.random.key(11), *inputs)

        restored = import_torch_checkpoint(str(path), name, variables)
        assert (jax.tree_util.tree_structure(restored["params"])
                == jax.tree_util.tree_structure(variables["params"]))

        j_out = ours.apply(restored, *inputs, train=False)
        with torch.no_grad():
            t_in = ([torch.from_numpy(mri).unsqueeze(1)] if not dual else
                    [torch.from_numpy(mri).unsqueeze(1),
                     torch.from_numpy(pet).unsqueeze(1)])
            t_out = theirs(*t_in)
        j_outs = j_out if isinstance(j_out, tuple) else (j_out,)
        t_outs = t_out if isinstance(t_out, tuple) else (t_out,)
        for a, b in zip(j_outs, t_outs):
            np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                       atol=2e-4, rtol=1e-3)

    def test_shape_mismatch_raises(self, rng):
        import jax
        import jax.numpy as jnp
        import torch

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.utils.torch_import import import_torch_checkpoint

        sys.path.insert(0, REFERENCE)
        from models.mymodel import model_single

        theirs = model_single(dim=128)
        ours = build_model("single", dim=64, use_pallas=False)
        img = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)),
                          jnp.float32)
        variables = ours.init(jax.random.key(0), img)
        with pytest.raises(ValueError, match="mismatch"):
            import_torch_checkpoint(theirs.state_dict(), "single", variables)

    def test_mnet_roundtrip_eval_logits(self, rng, tmp_path):
        """Mnet checkpoint import at the full reference geometry: a
        torch-random reference Mnet saved and imported must produce
        matching eval logits (dead spatial conv2/conv3 weights are
        skipped; reference: MiSePyNet.py:89-94,139-163)."""
        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.utils.torch_import import import_torch_checkpoint

        sys.path.insert(0, REFERENCE)
        from models.MiSePyNet import Mnet as TorchMnet

        torch.manual_seed(9)
        theirs = TorchMnet()
        theirs.eval()
        path = tmp_path / "mnet.pt"
        torch.save({"net_model": theirs.state_dict()}, path)

        ours = build_model("mnet", use_pallas=False, precision="highest")
        mri = rng.standard_normal((1, 91, 109, 91)).astype(np.float32)
        pet = rng.standard_normal((1, 91, 109, 91)).astype(np.float32)
        inputs = [jnp.asarray(mri[..., None]), jnp.asarray(pet[..., None])]
        variables = ours.init(jax.random.key(5), *inputs)

        restored = import_torch_checkpoint(str(path), "mnet", variables)
        assert (jax.tree_util.tree_structure(restored["params"])
                == jax.tree_util.tree_structure(variables["params"]))

        j_out = ours.apply(restored, *inputs, train=False)
        with torch.no_grad():
            t_out = theirs(torch.from_numpy(mri).unsqueeze(1),
                           torch.from_numpy(pet).unsqueeze(1))
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=2e-4, rtol=1e-3)

    def test_advit_vit_pytorch_layout_roundtrip(self, rng):
        """ADVIT import: synthesize a state_dict in the EXACT vit_pytorch
        1.7.4 key layout (to_patch_embedding.{1,2,3}, fused to_qkv rows,
        transformer.layers.i.{0,1}.net slots, final transformer.norm,
        dead mlp_head) and assert the importer restores the identical
        flax tree. Forward parity of this parameter convention vs the
        vit_pytorch architecture is pinned by TestViTEncoderVsVitPytorch;
        composing the two gives checkpoint-level coverage without the
        (uninstalled) package."""
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.utils.torch_import import import_torch_checkpoint

        ours = build_model("advit", use_pallas=False)
        H = W = 32
        mri = jnp.asarray(rng.standard_normal((1, H, W, 79, 1)), jnp.float32)
        variables = ours.init(jax.random.key(6), mri, mri)
        params, stats = variables["params"], variables["batch_stats"]

        sd = {}

        def put_linear(prefix, p, bias=True):
            sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T.copy()
            if bias:
                sd[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()

        def put_ln(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["scale"]).copy()
            sd[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()

        def put_conv(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(
                p["kernel"]).transpose(4, 3, 0, 1, 2).copy()
            sd[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()

        def put_bn(prefix, p, s):
            put_ln(prefix, p)
            sd[f"{prefix}.running_mean"] = np.asarray(s["mean"]).copy()
            sd[f"{prefix}.running_var"] = np.asarray(s["var"]).copy()
            sd[f"{prefix}.num_batches_tracked"] = np.asarray(0)

        for mod in ("mri", "pet"):
            t2, t2s = params[f"to_2d_{mod}"], stats[f"to_2d_{mod}"]
            for blk, (ci, bi) in zip(("ConvBNAct_0", "ConvBNAct_1"),
                                     ((0, 1), (4, 5))):
                put_conv(f"to_2d_{mod}.{ci}", t2[blk])
                put_bn(f"to_2d_{mod}.{bi}", t2[blk]["BatchNorm_0"],
                       t2s[blk]["BatchNorm_0"])
            v = params[f"vit_{mod}"]
            pe = f"vit_{mod}.to_patch_embedding"
            put_ln(f"{pe}.1", v["LayerNorm_0"])
            put_linear(f"{pe}.2", v["Dense_0"])
            put_ln(f"{pe}.3", v["LayerNorm_1"])
            sd[f"vit_{mod}.cls_token"] = np.asarray(v["cls_token"]).copy()
            sd[f"vit_{mod}.pos_embedding"] = np.asarray(
                v["pos_embedding"]).copy()
            tr = v["Transformer_0"]
            i = 0
            while f"Attention_{i}" in tr:
                a = tr[f"Attention_{i}"]
                layer = f"vit_{mod}.transformer.layers.{i}"
                # fused to_qkv rows = [q | k | v] out-features
                sd[f"{layer}.0.to_qkv.weight"] = np.concatenate(
                    [np.asarray(a["to_q"]["kernel"]),
                     np.asarray(a["to_kv"]["kernel"])], axis=1).T.copy()
                put_ln(f"{layer}.0.norm", tr[f"LayerNorm_{2 * i}"])
                put_linear(f"{layer}.0.to_out.0", a["to_out"])
                put_ln(f"{layer}.1.net.0", tr[f"LayerNorm_{2 * i + 1}"])
                f = tr[f"FeedForward_{i}"]
                put_linear(f"{layer}.1.net.1", f["Dense_0"])
                put_linear(f"{layer}.1.net.4", f["Dense_1"])
                i += 1
            put_ln(f"vit_{mod}.transformer.norm", tr[f"LayerNorm_{2 * i}"])
            # dead classification head under the CLS-latent reading
            sd[f"vit_{mod}.mlp_head.weight"] = np.zeros((2, 192), np.float32)
            sd[f"vit_{mod}.mlp_head.bias"] = np.zeros((2,), np.float32)
        put_linear("fc", params["fc"])

        restored = import_torch_checkpoint(sd, "advit", variables)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               restored["params"], params)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               restored["batch_stats"], stats)


class TestTrainingDynamics:
    """N-step training-equivalence vs the imported torch reference: from
    IDENTICAL initial weights (torch init -> import_torch_checkpoint),
    train both frameworks on identical fixed batches (aug off, f32
    'highest' precision) with the reference loss, and pin per-step
    losses, final parameters and BN running statistics. This is the
    composition nothing else covered: BN batch-stat updates x optimizer
    moments x LR schedule x the (triple) loss over many steps — the best
    available proxy for the BASELINE 'ACC/AUC within 1 pt' north star
    (reference hot loop: kfold_train_adversarial.py:101-136,
    optimizer: utils/utils.py:38-41).

    Tolerances are calibrated by measurement, not hope:
     - single/SGD(momentum .9)+MultiStepLR: semantics are exact, so drift
       stays at f32 noise (~1e-7 rel over 16 steps) — asserted TIGHT,
       final params and BN running stats included. This arm CAUGHT the
       biased-vs-unbiased running_var deviation (nn/batchnorm.py).
     - Adam: `m/(sqrt(v)+eps)` chaotically amplifies float-rounding noise
       once v is tiny (measured: ~1e-6 rel at steps 0-3, ~1e-2 by step
       12). Early steps asserted tight (a bias-correction/moment bug
       would show there), the trajectory against a loose chaos bound.
     - cnn_ad under ANY optimizer: the adversarial composition (GRL x
       batch-3 discriminator BN) is intrinsically chaotic — a 1e-7
       self-perturbation of OUR OWN weights grows to ~2e-2 by step 16
       (measured), so only the early-step window is a semantic signal."""

    N_STEPS = 16
    # (milestones in EPOCHS with 3 steps/epoch -> LR drops at steps 6, 12:
    # both transitions land inside the 16-step window)
    STEPS_PER_EPOCH = 3
    MILESTONES = (2, 4)

    def _batches(self, rng, modalities, n_batches=3, b=3,
                 shape=(16, 16, 16)):
        out = []
        for i in range(n_batches):
            batch = {k: rng.standard_normal((b, *shape)).astype(np.float32)
                     for k in modalities}
            batch["label"] = (rng.integers(0, 2, b)).astype(np.int64)
            out.append(batch)
        return out

    def _run_ours(self, model, opt_name, modalities, adversarial,
                  variables, batches, lr, momentum):
        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.train.optim import build_optimizer
        # build the TrainState directly around the imported variables
        # (create_state would re-initialize them)
        from transmf_ad_tpu.train.steps import TrainState, make_train_step

        milestones = self.MILESTONES if opt_name == "SGD" else ()
        tx, _ = build_optimizer(opt_name, lr, 0.0, self.STEPS_PER_EPOCH,
                                milestones=milestones, momentum=momentum)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            apply_fn=model.apply,
            tx=tx,
        )
        step = make_train_step(modalities, adversarial=adversarial,
                               aug_cfg=None, donate=False)
        key = jax.random.key(0)
        losses = []
        for i in range(self.N_STEPS):
            bt = batches[i % len(batches)]
            dev = {k: jnp.asarray(v) for k, v in bt.items()
                   if k != "label"}
            dev["label"] = jnp.asarray(bt["label"].astype(np.int32))
            state, aux = step(state, dev, key)
            losses.append(float(aux["loss"]))
        return state, losses

    def _run_torch(self, theirs, batches, modalities, adversarial,
                   opt_name, lr, momentum):
        import torch

        if opt_name == "Adam":
            opt = torch.optim.Adam(theirs.parameters(), lr=lr)
            sched = None
        else:
            opt = torch.optim.SGD(theirs.parameters(), lr=lr,
                                  momentum=momentum)
            sched = torch.optim.lr_scheduler.MultiStepLR(
                opt, milestones=list(self.MILESTONES), gamma=0.1)
        ce = torch.nn.CrossEntropyLoss()
        theirs.train()
        losses = []
        for i in range(self.N_STEPS):
            bt = batches[i % len(batches)]
            ins = [torch.from_numpy(bt[k]).unsqueeze(1) for k in modalities]
            label = torch.from_numpy(bt["label"])
            opt.zero_grad()
            out = theirs(*ins)
            if adversarial:
                logits, d_mri, d_pet = out
                b = label.shape[0]
                loss = ce(logits, label) + (
                    ce(d_mri, torch.ones(b, dtype=torch.long))
                    + ce(d_pet, torch.zeros(b, dtype=torch.long))) / 2
            else:
                loss = ce(out, label)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            if sched is not None and (i + 1) % self.STEPS_PER_EPOCH == 0:
                sched.step()  # the reference steps the scheduler per epoch
        return losses

    @pytest.mark.parametrize("opt_name,lr,momentum", [
        ("SGD", 1e-2, 0.9),
        ("Adam", 1e-3, 0.0),
    ])
    @pytest.mark.parametrize("name,ref_name,modalities,adv", [
        ("single", "model_single", ("MRI",), False),
        ("cnn_ad", "model_CNN_ad", ("MRI", "PET"), True),
    ])
    def test_n_step_parity(self, rng, name, ref_name, modalities, adv,
                           opt_name, lr, momentum):
        import importlib

        import torch

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import build_model
        from transmf_ad_tpu.utils.torch_import import (
            import_torch_checkpoint, map_state_dict)

        sys.path.insert(0, REFERENCE)
        mymodel = importlib.import_module("models.mymodel")
        torch.manual_seed(31)
        dim = 128 if name == "single" else 16
        theirs = getattr(mymodel, ref_name)(dim=dim)

        ours = build_model(name, dim=dim, use_pallas=False,
                           precision="highest")
        shape = (16, 16, 16)
        batches = self._batches(rng, modalities, shape=shape)
        inputs = [jnp.asarray(batches[0][k][..., None]) for k in modalities]
        variables = ours.init(jax.random.key(0), *inputs)
        variables = import_torch_checkpoint(theirs.state_dict(), name,
                                            variables)

        state, j_losses = self._run_ours(ours, opt_name, modalities, adv,
                                         variables, batches, lr, momentum)
        t_losses = self._run_torch(theirs, batches, modalities, adv,
                                   opt_name, lr, momentum)

        if opt_name == "Adam" or name == "cnn_ad":
            # semantic window: a bias-correction/moment/loss bug would
            # show here; beyond it the system amplifies pure float noise
            # (Adam's rsqrt; cnn_ad's GRL x small-batch BN — see class
            # docstring for the measured self-perturbation growth)
            np.testing.assert_allclose(j_losses[:4], t_losses[:4],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(j_losses, t_losses,
                                       rtol=5e-2, atol=1e-3)
            return

        # single/SGD + MultiStepLR: exact semantics -> f32-noise-tight
        # over the whole window, final params and BN running stats
        # included
        np.testing.assert_allclose(j_losses, t_losses, rtol=1e-5,
                                   atol=1e-6)
        t_params, t_stats = map_state_dict(theirs.state_dict(), name)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.batch_stats),
            jax.tree_util.tree_leaves_with_path(t_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"BN running stats diverged at {pa}")
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(t_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"params diverged at {pa}")


class TestViTEncoderVsVitPytorch:
    """Cross-check C11's ViT encoder internals against vit_pytorch 1.7.4
    (the version the reference pins in requirements.txt). The package is
    not installed in this image, so its encoder is re-built here in torch
    following the published 1.7.4 architecture exactly: patchify
    Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)') -> LN -> Linear ->
    LN, randn cls/pos, emb dropout, transformer blocks whose Attention
    (in-module pre-LN, FUSED to_qkv without bias, softmax(q k^T * scale))
    and FeedForward (in-module pre-LN, exact GELU) carry residuals, and a
    final LayerNorm; CLS latent out. This pins patchify order, pre-LN
    placement, qkv fusion layout and CLS handling — the internals the
    hand-built reference twin (TestADVITParity) could not isolate."""

    def test_cls_latent_matches_vit_pytorch_architecture(self, rng):
        import torch
        import torch.nn as tnn

        import jax
        import jax.numpy as jnp

        from transmf_ad_tpu.models import ViTEncoder

        H = W = 32
        DIM_V, DEPTH_V, HEADS_V, MLP = 48, 2, 3, 96
        PATCH = 16
        dim_head = DIM_V // HEADS_V

        ours = ViTEncoder(image_size=H, patch_size=PATCH, dim=DIM_V,
                          depth=DEPTH_V, heads=HEADS_V, mlp_dim=MLP,
                          dropout=0.0, emb_dropout=0.0, use_pallas=False,
                          precision="highest")
        img = rng.standard_normal((2, H, W, 1)).astype(np.float32)
        variables = ours.init(jax.random.key(8), jnp.asarray(img))
        p = variables["params"]

        class VPAttention(tnn.Module):  # vit_pytorch 1.7.4 Attention
            def __init__(self):
                super().__init__()
                inner = HEADS_V * dim_head
                self.norm = tnn.LayerNorm(DIM_V)
                self.to_qkv = tnn.Linear(DIM_V, inner * 3, bias=False)
                self.to_out = tnn.Linear(inner, DIM_V)
                self.scale = dim_head ** -0.5

            def forward(self, x):
                b, n, _ = x.shape
                x = self.norm(x)
                qkv = self.to_qkv(x).chunk(3, dim=-1)
                q, k, v = (t.reshape(b, n, HEADS_V, dim_head).transpose(1, 2)
                           for t in qkv)
                dots = torch.matmul(q, k.transpose(-1, -2)) * self.scale
                attn = dots.softmax(dim=-1)
                out = torch.matmul(attn, v).transpose(1, 2).reshape(b, n, -1)
                return self.to_out(out)

        class VPFeedForward(tnn.Module):  # vit_pytorch 1.7.4 FeedForward
            def __init__(self):
                super().__init__()
                self.net = tnn.Sequential(
                    tnn.LayerNorm(DIM_V), tnn.Linear(DIM_V, MLP), tnn.GELU(),
                    tnn.Dropout(0.0), tnn.Linear(MLP, DIM_V), tnn.Dropout(0.0))

            def forward(self, x):
                return self.net(x)

        class VPEncoder(tnn.Module):  # vit_pytorch 1.7.4 ViT minus mlp_head
            def __init__(self):
                super().__init__()
                n_patches = (H // PATCH) * (W // PATCH)
                patch_dim = PATCH * PATCH
                self.patch_norm_in = tnn.LayerNorm(patch_dim)
                self.patch_proj = tnn.Linear(patch_dim, DIM_V)
                self.patch_norm_out = tnn.LayerNorm(DIM_V)
                self.pos = tnn.Parameter(torch.zeros(1, n_patches + 1, DIM_V))
                self.cls = tnn.Parameter(torch.zeros(1, 1, DIM_V))
                self.layers = tnn.ModuleList(
                    [tnn.ModuleList([VPAttention(), VPFeedForward()])
                     for _ in range(DEPTH_V)])
                self.final_norm = tnn.LayerNorm(DIM_V)

            def forward(self, img):  # (B, 1, H, W) channels-first
                b, c, h, w = img.shape
                ph = PATCH
                # Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)')
                x = img.reshape(b, c, h // ph, ph, w // ph, ph)
                x = x.permute(0, 2, 4, 3, 5, 1).reshape(
                    b, (h // ph) * (w // ph), ph * ph * c)
                x = self.patch_norm_out(self.patch_proj(self.patch_norm_in(x)))
                x = torch.cat([self.cls.expand(b, -1, -1), x], dim=1)
                x = x + self.pos[:, : x.shape[1]]
                for attn, ff in self.layers:
                    x = attn(x) + x
                    x = ff(x) + x
                return self.final_norm(x)[:, 0]  # CLS latent

        theirs = VPEncoder()
        theirs.eval()
        tr = p["Transformer_0"]
        with torch.no_grad():
            for ln, key in ((theirs.patch_norm_in, "LayerNorm_0"),
                            (theirs.patch_norm_out, "LayerNorm_1"),
                            (theirs.final_norm,
                             f"LayerNorm_{2 * DEPTH_V}")):
                src = p[key] if key in p else tr[key]
                ln.weight.data = torch.from_numpy(
                    np.asarray(src["scale"]).copy())
                ln.bias.data = torch.from_numpy(
                    np.asarray(src["bias"]).copy())
            _to_torch_linear(theirs.patch_proj, p["Dense_0"]["kernel"],
                             p["Dense_0"]["bias"])
            theirs.cls.data = torch.from_numpy(
                np.asarray(p["cls_token"]).copy())
            theirs.pos.data = torch.from_numpy(
                np.asarray(p["pos_embedding"]).copy())
            for i, (attn, ff) in enumerate(theirs.layers):
                a = tr[f"Attention_{i}"]
                # our split to_q/to_kv maps onto the fused to_qkv rows
                qkv = np.concatenate(
                    [np.asarray(a["to_q"]["kernel"]),
                     np.asarray(a["to_kv"]["kernel"])], axis=1)
                _to_torch_linear(attn.to_qkv, qkv)
                _to_torch_linear(attn.to_out, a["to_out"]["kernel"],
                                 a["to_out"]["bias"])
                for ln, key in ((attn.norm, f"LayerNorm_{2 * i}"),
                                (ff.net[0], f"LayerNorm_{2 * i + 1}")):
                    ln.weight.data = torch.from_numpy(
                        np.asarray(tr[key]["scale"]).copy())
                    ln.bias.data = torch.from_numpy(
                        np.asarray(tr[key]["bias"]).copy())
                f = tr[f"FeedForward_{i}"]
                _to_torch_linear(ff.net[1], f["Dense_0"]["kernel"],
                                 f["Dense_0"]["bias"])
                _to_torch_linear(ff.net[4], f["Dense_1"]["kernel"],
                                 f["Dense_1"]["bias"])

            t_lat = theirs(torch.from_numpy(
                img.transpose(0, 3, 1, 2).copy()))

        j_lat = ours.apply(variables, jnp.asarray(img), train=False)
        np.testing.assert_allclose(np.asarray(j_lat), t_lat.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestKFoldEndToEndParity:
    """The accuracy north star, closed end-to-end at test scale: BOTH
    frameworks run the COMPLETE 5-fold protocol of the reference driver
    (task-seeded KFold split, 80/20 inner train/val split, per-epoch
    validation with best-val-accuracy greater-or-equal checkpointing,
    test evaluation with the best weights restored, mean±std aggregation
    of [loss, acc, sen, spe, f1, auc]) on a learnable synthetic
    ADNI-format dataset, and the final per-fold metric tables must agree
    (reference protocol: kfold_train_single.py:23-243 /
    kfold_train_adversarial.py:257-273).

    Every stochastic degree of freedom is pinned IDENTICAL across the
    frameworks so the comparison isolates the training-system semantics
    (loss, optimizer + MultiStepLR, BN batch/running stats, checkpoint
    retention, eval-metric math), not RNG luck:
     - per-fold initial weights: torch init -> import_torch_checkpoint;
     - input volumes: the same VolumeSource-decoded float32 arrays feed
       both (the reference's MONAI Compose without augmentation is
       LoadImaged+EnsureChannelFirst+ScaleIntensity = exactly this
       decode+min-max path, reference: datasets/ADNI.py:76-83);
     - per-epoch batch order: the torch loop replays our Loader's
       documented shuffle stream (one np RNG, reshuffled copy per
       epoch) — a shuffle realization is not a semantic of either
       framework;
     - SGD(momentum)+MultiStepLR: the optimizer arm whose semantics are
       EXACT across frameworks (TestTrainingDynamics), so residual
       divergence is float noise, not chaos.

    Augmentation is OFF on both sides: the reference pipeline needs
    MONAI (absent in this image) and the exact-MONAI host pipeline is
    already oracle-tested per-op (tests/test_exact_monai.py).

    Asserted: per-fold test losses track within 2%, both frameworks
    actually learn (mean acc >= 0.75), and the aggregated mean of every
    metric agrees within 0.06 (one boundary-sample prediction flip in
    one fold moves a 6-sample fold's acc by 0.167 = 0.033 of the mean;
    the bound allows one such flip plus slack). The measured table lives
    in PARITY.md §"End-to-end k-fold".
    """

    FOLDS = 5
    # 16 epochs: enough momentum-0.9 BN running-stat updates (~100) for
    # eval-mode statistics to converge — at 5 epochs BOTH frameworks rank
    # perfectly (AUC 1.0) but mis-threshold identically (acc ~0.37)
    EPOCHS = 16
    BATCH = 4
    LR = 1e-2
    MOMENTUM = 0.9
    MILESTONES = (10, 14)
    DIM = 128  # the reference model_single head hard-codes Linear(128, 64)
    SEED = 7

    def _dataset(self, tmp_path):
        from transmf_ad_tpu.data.adni import ADNI
        from transmf_ad_tpu.data.pipeline import VolumeSource
        from transmf_ad_tpu.data.synthetic import make_synthetic_adni

        root = make_synthetic_adni(str(tmp_path / "adni"), n_per_group=15,
                                   shape=(16, 16, 16), seed=3)
        recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
        src = VolumeSource(recs, keys=("MRI",), dtype=np.float32)
        for i in range(len(src)):
            src[i]  # pre-decode: both sides index the same float32 arrays
        return src

    def _splits(self, n):
        from sklearn.model_selection import KFold, train_test_split

        out = []
        kf = KFold(n_splits=self.FOLDS, shuffle=True, random_state=self.SEED)
        for train_idx, test_idx in kf.split(np.arange(n)):
            tr, val = train_test_split(train_idx, test_size=0.2,
                                       random_state=self.SEED)
            out.append((list(map(int, tr)), list(map(int, val)),
                        list(map(int, test_idx))))
        return out

    def _epoch_orders(self, indices, fold):
        """Replay transmf Loader's shuffle stream: ONE np RNG seeded
        seed+fold, shuffling a fresh copy of the index list per epoch
        (data/pipeline.py::Loader._batches)."""
        rng = np.random.default_rng(self.SEED + fold)
        orders = []
        for _ in range(self.EPOCHS):
            order = np.asarray(indices, np.int64).copy()
            rng.shuffle(order)
            orders.append([int(i) for i in order])
        return orders

    def _torch_init(self, fold):
        import importlib

        import torch

        sys.path.insert(0, REFERENCE)
        mymodel = importlib.import_module("models.mymodel")
        torch.manual_seed(100 + fold)
        return mymodel.model_single(dim=self.DIM)

    # ---- torch arm: the reference protocol re-driven on CPU ----

    def _run_torch_fold(self, src, fold, tr, val, test):
        import copy

        import torch

        from transmf_ad_tpu.train.metrics import confusion_metrics, roc_auc

        model = self._torch_init(fold)
        opt = torch.optim.SGD(model.parameters(), lr=self.LR,
                              momentum=self.MOMENTUM)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(self.MILESTONES), gamma=0.1)
        ce = torch.nn.CrossEntropyLoss()

        def batch_tensors(idx):
            x = np.stack([src[i]["MRI"] for i in idx])[:, None]
            y = np.asarray([int(src.records[i]["label"]) for i in idx])
            return torch.from_numpy(x), torch.from_numpy(y)

        def evaluate(idx):
            model.eval()
            probs, labels, nll = [], [], []
            with torch.no_grad():
                for s in range(0, len(idx), self.BATCH):
                    x, y = batch_tensors(idx[s: s + self.BATCH])
                    logits = model(x)
                    nll.append(torch.nn.functional.cross_entropy(
                        logits, y, reduction="none").numpy())
                    probs.append(torch.softmax(logits, -1)[:, 1].numpy())
                    labels.append(y.numpy())
            probs = np.concatenate(probs)
            labels = np.concatenate(labels)
            nll = np.concatenate(nll)
            pred = (probs >= 0.5).astype(int)
            conf = np.zeros((2, 2), np.int64)
            np.add.at(conf, (labels, pred), 1)
            m = confusion_metrics(conf)
            return {
                "loss": float(nll.mean()),
                "accuracy": float((pred == labels).mean()),
                "auc": roc_auc(probs, labels),
                **m,
            }

        best_acc, best_sd = -1.0, None
        orders = self._epoch_orders(tr, fold)
        for ep in range(self.EPOCHS):
            model.train()
            order = orders[ep]
            for s in range(0, len(order), self.BATCH):
                x, y = batch_tensors(order[s: s + self.BATCH])
                opt.zero_grad()
                loss = ce(model(x), y)
                loss.backward()
                opt.step()
            sched.step()
            acc = evaluate(val)["accuracy"]
            if acc >= best_acc:  # greater_or_equal retention (reference)
                best_acc = acc
                best_sd = copy.deepcopy(model.state_dict())
        model.load_state_dict(best_sd)
        m = evaluate(test)
        return [m["loss"], m["accuracy"], m["sen"], m["spe"], m["f1"],
                m["auc"]]

    # ---- transmf arm: the real Trainer through the same protocol ----

    def _run_ours_fold(self, src, fold, tr, val, test, tmp_path):
        import jax

        from transmf_ad_tpu.data.pipeline import Loader
        from transmf_ad_tpu.train.trainer import Trainer, TrainerConfig
        from transmf_ad_tpu.utils.torch_import import import_torch_checkpoint

        train_loader = Loader(src, tr, batch_size=self.BATCH, shuffle=True,
                              seed=self.SEED + fold)
        val_loader = Loader(src, val, batch_size=self.BATCH)
        test_loader = Loader(src, test, batch_size=self.BATCH)
        cfg = TrainerConfig(
            model="single", dim=self.DIM, optimizer="SGD", lr=self.LR,
            momentum=self.MOMENTUM, milestones=self.MILESTONES,
            epochs=self.EPOCHS, aug=False, seed=self.SEED,
            save_dir=str(tmp_path / f"fold{fold}"), use_pallas=False,
            dtype="float32", data_parallel=False, progress=False,
        )
        trainer = Trainer(cfg)
        trainer.init_state(train_loader.peek(),
                           steps_per_epoch=max(1, len(train_loader)))
        theirs = self._torch_init(fold)
        restored = import_torch_checkpoint(
            theirs.state_dict(), "single",
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats})
        trainer.state = trainer.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"])
        return trainer.fit(train_loader, val_loader, test_loader)

    @pytest.mark.slow
    def test_five_fold_metrics_match(self, tmp_path):
        src = self._dataset(tmp_path)
        splits = self._splits(len(src))
        ours, theirs = [], []
        for fold, (tr, val, test) in enumerate(splits):
            ours.append(self._run_ours_fold(src, fold, tr, val, test,
                                            tmp_path))
            theirs.append(self._run_torch_fold(src, fold, tr, val, test))
        ours = np.asarray(ours, np.float64)
        theirs = np.asarray(theirs, np.float64)
        names = ("loss", "acc", "sen", "spe", "f1", "auc")
        for name, o, t in zip(names, np.nanmean(ours, 0),
                              np.nanmean(theirs, 0)):
            print(f"{name}: ours {o:.4f} vs reference {t:.4f}")

        # per-fold test losses track in ABSOLUTE terms: converged CE
        # losses sit near zero, where ~96 steps of f32 reduction-order
        # noise gives large RELATIVE but tiny absolute drift (measured
        # max |diff| 0.014 across folds)
        np.testing.assert_allclose(ours[:, 0], theirs[:, 0], atol=0.03)
        # both frameworks actually learned the task
        assert np.nanmean(ours[:, 1]) >= 0.75
        assert np.nanmean(theirs[:, 1]) >= 0.75
        # aggregated means agree within one boundary-flip of slack
        o_mean, t_mean = np.nanmean(ours, 0), np.nanmean(theirs, 0)
        for i, name in enumerate(names):
            if np.isnan(o_mean[i]) and np.isnan(t_mean[i]):
                continue
            assert abs(o_mean[i] - t_mean[i]) <= 0.06, (
                f"{name}: ours {o_mean[i]:.4f} vs reference "
                f"{t_mean[i]:.4f}\nours folds:\n{ours}\nref folds:\n{theirs}")

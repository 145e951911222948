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

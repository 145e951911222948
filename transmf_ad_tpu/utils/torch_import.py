"""Import reference PyTorch checkpoints into flax parameter trees.

The reference trains with ignite checkpointing and has a (commented)
pretrain-load path — `--task pretrain` produces a `pretrainAD.pt` that
`kfold_train_adversarial.py` would restore before fine-tuning
(reference: kfold_train_adversarial.py:80-83, Checkpoint saver :222-227).
This module makes such checkpoints loadable here: it maps a torch
`state_dict` of any of the six task models (reference: models/mymodel.py)
onto the corresponding flax `{params, batch_stats}` tree, with the layout
transforms the two frameworks differ by:

  - Conv3d weight (O, I, D, H, W)  ->  DHWIO kernel (D, H, W, I, O)
  - Linear weight (out, in)        ->  Dense kernel (in, out)
  - BatchNorm weight/bias/running_mean/running_var
                                   ->  params {scale, bias} +
                                       batch_stats {mean, var}
  - reference sNet Sequential slots conv1.0/1, conv2.0/1, conv2.3/4,
    conv3.0/1, conv3.3/4, conv4.0/1, conv4.3/4
                                   ->  ConvBNAct_0..6
  - networks.Transformer layers.i.{0,1} (PreNorm attn/ff) + final norm
                                   ->  Attention_i, LayerNorm_{2i},
                                       LayerNorm_{2i+1}, FeedForward_i,
                                       LayerNorm_{2*depth}
  - CrossTransformer(_MOD_AVG) layers.i.{0,1} (per-depth 1-layer pairs)
                                   ->  Transformer_{2i}, Transformer_{2i+1}

ADVIT checkpoints (reference: models/ADVIT.py) additionally map the
vit_pytorch 1.7.4 ViT layout (the version requirements.txt pins):
to_patch_embedding.{1,2,3} -> LayerNorm_0/Dense_0/LayerNorm_1,
cls_token/pos_embedding verbatim, transformer.layers.i.0 with FUSED
to_qkv split into our to_q/to_kv, transformer.layers.i.1.net.{0,1,4},
transformer.norm -> the final LayerNorm. `mlp_head` weights are dead
under the CLS-latent reading this rebuild documents
(transmf_ad_tpu/models/advit.py:8-19) and are skipped.

Mnet checkpoints (reference: models/MiSePyNet.py) map the three per-view
slice stacks (conv1.0/1, conv2.0/1+3/4, conv3.0/1+3/4+6/7 ->
ConvBNAct_0..5) and the DRIVEN spatial conv1 stack (slots 0/1, 4/5, 8/9
-> _StridedStack_0.ConvBNAct_0..2); spatial conv2/conv3 are dead in the
reference forward (MiSePyNet.py:89-94) and are skipped.

Accepted checkpoint containers: a bare state_dict, or one wrapped under
'net_model' / 'model' / 'state_dict' (ignite saves the bare state_dict
for a single-object Checkpoint; the wrappers cover hand-rolled saves).

The torch dependency is load-time only (torch.load); all tensor
manipulation is numpy. The inverse mapping is exercised by
tests/test_reference_parity.py; the round-trip (torch .pt -> flax ->
matching eval logits) by TestTorchCheckpointImport there.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["import_torch_checkpoint", "SUPPORTED_MODELS"]

SUPPORTED_MODELS = ("single", "cnn", "cnn_ad", "transformer",
                    "transformer_res", "ad", "advit", "mnet")


def _np(t) -> np.ndarray:
    # works for torch tensors (detach->cpu->numpy) and plain arrays
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd, prefix):
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)  # OIDHW->DHWIO
    return {"kernel": w, "bias": _np(sd[f"{prefix}.bias"])}


def _linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv_bn_seq(sd, slots):
    """Map (conv_prefix, bn_prefix) pairs onto ConvBNAct_0..N-1 trees."""
    params: Dict = {}
    stats: Dict = {}
    for i, (cs, bs) in enumerate(slots):
        blk = f"ConvBNAct_{i}"
        p = _conv(sd, cs)
        bp, bst = _bn(sd, bs)
        p["BatchNorm_0"] = bp
        params[blk] = p
        stats[blk] = {"BatchNorm_0": bst}
    return params, stats


def _snet(sd, prefix):
    """Reference sNet (reference: models/networks.py:18-61) -> SNet tree."""
    slots = ["conv1.0", "conv2.0", "conv2.3", "conv3.0", "conv3.3",
             "conv4.0", "conv4.3"]
    bns = ["conv1.1", "conv2.1", "conv2.4", "conv3.1", "conv3.4",
           "conv4.1", "conv4.4"]
    return _conv_bn_seq(sd, [(f"{prefix}.{c}", f"{prefix}.{b}")
                             for c, b in zip(slots, bns)])


def _layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _transformer(sd, prefix, depth=1):
    """Reference networks.Transformer (reference: models/networks.py:215-230)
    -> our nn.attention.Transformer param tree."""
    p: Dict = {}
    for i in range(depth):
        attn = f"{prefix}.layers.{i}.0"
        ff = f"{prefix}.layers.{i}.1"
        p[f"Attention_{i}"] = {
            "to_q": _linear(sd, f"{attn}.fn.to_q", bias=False),
            "to_kv": _linear(sd, f"{attn}.fn.to_kv", bias=False),
            "to_out": _linear(sd, f"{attn}.fn.to_out.0"),
        }
        p[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{attn}.norm")
        p[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{ff}.norm")
        p[f"FeedForward_{i}"] = {
            "Dense_0": _linear(sd, f"{ff}.fn.net.0"),
            "Dense_1": _linear(sd, f"{ff}.fn.net.3"),
        }
    p[f"LayerNorm_{2 * depth}"] = _layernorm(sd, f"{prefix}.norm")
    return p


def _cross_transformer(sd, prefix, depth):
    """CrossTransformer / CrossTransformer_MOD_AVG: per depth a pair of
    1-layer Transformers (reference: models/networks.py:233-281) ->
    Transformer_{2i} (mri) / Transformer_{2i+1} (pet)."""
    p: Dict = {}
    for i in range(depth):
        p[f"Transformer_{2 * i}"] = _transformer(
            sd, f"{prefix}.layers.{i}.0", depth=1)
        p[f"Transformer_{2 * i + 1}"] = _transformer(
            sd, f"{prefix}.layers.{i}.1", depth=1)
    return p


def _mlp_head(sd, prefix, dense_slots=(0, 2)):
    """Linear->ReLU->Linear head (reference: mymodel.py:20,50)."""
    return {f"Dense_{i}": _linear(sd, f"{prefix}.{s}")
            for i, s in enumerate(dense_slots)}


def _bn_head(sd, prefix, slots=((0, 1), (4, 5), (8, None))):
    """Linear->BN->ReLU->Drop x2 -> Linear head
    (reference: mymodel.py:190-192)."""
    params: Dict = {}
    stats: Dict = {}
    bn_i = 0
    for i, (dense, bn) in enumerate(slots):
        params[f"Dense_{i}"] = _linear(sd, f"{prefix}.{dense}")
        if bn is not None:
            bp, bst = _bn(sd, f"{prefix}.{bn}")
            params[f"BatchNorm_{bn_i}"] = bp
            stats[f"BatchNorm_{bn_i}"] = bst
            bn_i += 1
    return params, stats


def _discriminator(sd, prefix="D"):
    """dim->128->BN->ReLU->2 (reference: mymodel.py:152,194)."""
    bp, bst = _bn(sd, f"{prefix}.1")
    params = {"Dense_0": _linear(sd, f"{prefix}.0"),
              "BatchNorm_0": bp,
              "Dense_1": _linear(sd, f"{prefix}.3")}
    return params, {"BatchNorm_0": bst}


def _vit_encoder(sd, prefix):
    """vit_pytorch 1.7.4 ViT (reference: models/ADVIT.py:31-52) ->
    ViTEncoder tree. Splits the fused to_qkv rows into our to_q / to_kv;
    skips the dead `mlp_head` (see module docstring)."""
    p: Dict = {
        "LayerNorm_0": _layernorm(sd, f"{prefix}.to_patch_embedding.1"),
        "Dense_0": _linear(sd, f"{prefix}.to_patch_embedding.2"),
        "LayerNorm_1": _layernorm(sd, f"{prefix}.to_patch_embedding.3"),
        "cls_token": _np(sd[f"{prefix}.cls_token"]),
        "pos_embedding": _np(sd[f"{prefix}.pos_embedding"]),
    }
    depth = 0
    while f"{prefix}.transformer.layers.{depth}.0.norm.weight" in sd:
        depth += 1
    tr: Dict = {}
    for i in range(depth):
        attn = f"{prefix}.transformer.layers.{i}.0"
        ff = f"{prefix}.transformer.layers.{i}.1"
        qkv = _np(sd[f"{attn}.to_qkv.weight"])  # (3*inner, dim) fused rows
        inner = qkv.shape[0] // 3
        tr[f"Attention_{i}"] = {
            "to_q": {"kernel": qkv[:inner].T.copy()},
            "to_kv": {"kernel": qkv[inner:].T.copy()},
            "to_out": _linear(sd, f"{attn}.to_out.0"),
        }
        tr[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{attn}.norm")
        tr[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{ff}.net.0")
        tr[f"FeedForward_{i}"] = {
            "Dense_0": _linear(sd, f"{ff}.net.1"),
            "Dense_1": _linear(sd, f"{ff}.net.4"),
        }
    tr[f"LayerNorm_{2 * depth}"] = _layernorm(sd, f"{prefix}.transformer.norm")
    p["Transformer_0"] = tr
    return p


def _mnet_slice(sd, prefix):
    """slice_cnn conv1/conv2/conv3 branches (reference: MiSePyNet.py:5-38)
    -> SliceCNN's ConvBNAct_0..5 (branch order b1, b2 x2, b3 x3)."""
    slots = [("conv1", 0, 1), ("conv2", 0, 1), ("conv2", 3, 4),
             ("conv3", 0, 1), ("conv3", 3, 4), ("conv3", 6, 7)]
    return _conv_bn_seq(sd, [(f"{prefix}.{c}.{ci}", f"{prefix}.{c}.{bi}")
                             for c, ci, bi in slots])


def _mnet_spatial(sd, prefix):
    """spatial_cnn's DRIVEN conv1 stack (reference: MiSePyNet.py:44-56,89-94)
    -> the shared _StridedStack_0; conv2/conv3 are dead and skipped."""
    params, stats = _conv_bn_seq(
        sd, [(f"{prefix}.conv1.{ci}", f"{prefix}.conv1.{bi}")
             for ci, bi in ((0, 1), (4, 5), (8, 9))])
    return {"_StridedStack_0": params}, {"_StridedStack_0": stats}


def _infer_cross_depth(sd, prefix="fuse_transformer"):
    depth = 0
    while f"{prefix}.layers.{depth}.0.norm.weight" in sd:
        depth += 1
    return depth


def map_state_dict(sd: Dict, model_name: str):
    """Map a reference state_dict to flax (params, batch_stats) trees."""
    if model_name not in SUPPORTED_MODELS:
        raise ValueError(
            f"torch import supports {SUPPORTED_MODELS}, got '{model_name}'")
    params: Dict = {}
    stats: Dict = {}
    if model_name == "single":
        params["cnn"], stats["cnn"] = _snet(sd, "cnn")
        params["fc"] = _mlp_head(sd, "fc")
        return params, stats

    if model_name == "advit":
        for mod in ("mri", "pet"):
            params[f"to_2d_{mod}"], stats[f"to_2d_{mod}"] = _conv_bn_seq(
                sd, [(f"to_2d_{mod}.{ci}", f"to_2d_{mod}.{bi}")
                     for ci, bi in ((0, 1), (4, 5))])
            params[f"vit_{mod}"] = _vit_encoder(sd, f"vit_{mod}")
        params["fc"] = _linear(sd, "fc")
        return params, stats

    if model_name == "mnet":
        for mod in ("mri", "pet"):
            mp: Dict = {}
            ms: Dict = {}
            for view in ("axial", "col", "sag"):
                mp[f"slice_{view}"], ms[f"slice_{view}"] = _mnet_slice(
                    sd, f"{mod}.slice_cnn_{view}")
                mp[f"spatial_{view}"], ms[f"spatial_{view}"] = _mnet_spatial(
                    sd, f"{mod}.spatial_cnn_{view}")
            params[mod], stats[mod] = mp, ms
        # fc head: Linear(0)->BN(1)->ReLU->Drop->Linear(4)->BN(5)->ReLU->
        # Drop->Linear(8) (reference: MiSePyNet.py:144-154)
        for i, (dense, bn) in enumerate(((0, 1), (4, 5), (8, None))):
            params[f"Dense_{i}"] = _linear(sd, f"fc.{dense}")
            if bn is not None:
                bp, bst = _bn(sd, f"fc.{bn}")
                params[f"BatchNorm_{i}"] = bp
                stats[f"BatchNorm_{i}"] = bst
        return params, stats

    for mod in ("mri_cnn", "pet_cnn"):
        params[mod], stats[mod] = _snet(sd, mod)

    if model_name == "cnn":
        params["fc"] = _mlp_head(sd, "fc")
    elif model_name == "cnn_ad":
        params["D"], stats["D"] = _discriminator(sd)
        params["fc_cls"] = _mlp_head(sd, "fc_cls")
    elif model_name in ("transformer", "ad"):
        depth = _infer_cross_depth(sd)
        params["fuse_transformer"] = _cross_transformer(
            sd, "fuse_transformer", depth)
        params["fc_cls"], stats["fc_cls"] = _bn_head(sd, "fc_cls")
        if model_name == "ad":
            params["D"], stats["D"] = _discriminator(sd)
    elif model_name == "transformer_res":
        depth = _infer_cross_depth(sd)
        params["fuse_transformer"] = _cross_transformer(
            sd, "fuse_transformer", depth)
        params["fc_cls"] = {
            f"Dense_{i}": _linear(sd, f"fc_cls.{s}")
            for i, s in enumerate((0, 3, 6))
        }
    return params, stats


def _unwrap(obj):
    for key in ("net_model", "model", "state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            return obj[key]
    return obj


def _check_shapes(mapped, template, what):
    import jax

    mleaves = jax.tree_util.tree_leaves_with_path(mapped)
    tpaths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(template)
    }
    if len(mleaves) != len(tpaths):
        raise ValueError(
            f"{what}: checkpoint maps {len(mleaves)} tensors but the model "
            f"has {len(tpaths)} (dim/depth mismatch?)")
    for p, v in mleaves:
        key = jax.tree_util.keystr(p)
        if key not in tpaths:
            raise ValueError(f"{what}: unexpected tensor at {key}")
        if tuple(v.shape) != tuple(tpaths[key]):
            raise ValueError(
                f"{what}: shape mismatch at {key}: checkpoint "
                f"{tuple(v.shape)} vs model {tuple(tpaths[key])}")


def import_torch_checkpoint(path_or_state, model_name: str, variables=None):
    """Load a reference `.pt` checkpoint into flax variable trees.

    path_or_state: path to a torch checkpoint (ignite 'best_label_net_
    model_*.pt' / 'pretrainAD.pt' style) or an in-memory state_dict.
    model_name: registry name of the target model ('ad', 'cnn_ad', ...).
    variables: optional initialized flax variables; when given, every
    mapped tensor is shape-checked against them before returning.

    Returns {"params": ..., "batch_stats": ...} ready for
    `state.replace(...)` / Trainer's `pretrained_path` restore.

    reference: kfold_train_adversarial.py:80-83 (pretrain load),
    :222-227 (checkpoint format).
    """
    if isinstance(path_or_state, (str, bytes)) or hasattr(
            path_or_state, "__fspath__"):
        import torch

        obj = torch.load(path_or_state, map_location="cpu",
                         weights_only=True)
    else:
        obj = path_or_state
    sd = _unwrap(obj)
    params, stats = map_state_dict(sd, model_name)
    if variables is not None:
        _check_shapes(params, variables["params"], "params")
        _check_shapes(stats, variables.get("batch_stats", {}), "batch_stats")
    return {"params": params, "batch_stats": stats}

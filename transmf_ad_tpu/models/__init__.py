"""Task model zoo and registry.

`build_model(name, **overrides)` constructs a model by registry key with the
reference's driver-level hyperparameters as defaults:
 - 'single', 'cnn', 'transformer', 'transformer_res', 'cnn_ad', 'ad'
   (reference: models/mymodel.py; the k-fold drivers use heads=4,
   dim_head=dim//4, mlp_dim=dim*4 — reference: kfold_train_adversarial.py:78-79;
   the hold-out driver uses heads=8, dim_head=dim//8 —
   reference: train_adversarial.py:30-31)
 - 'advit' (reference: models/ADVIT.py), 'mnet' (reference: models/MiSePyNet.py)

`ADVERSARIAL` lists models returning (logits, D_MRI, D_PET) triples.
"""

from __future__ import annotations

from .advit import ADVIT, ViTEncoder  # noqa: F401
from .misepynet import MiSePyNet, Mnet, SliceCNN, SpatialCNN  # noqa: F401
from .transmf import (  # noqa: F401
    ModelAd,
    ModelCNN,
    ModelCNNAd,
    ModelSingle,
    ModelTransformer,
    ModelTransformerRes,
)

ADVERSARIAL = {"cnn_ad", "ad"}
SINGLE_MODALITY = {"single"}

_REGISTRY = {
    "single": ModelSingle,
    "cnn": ModelCNN,
    "transformer": ModelTransformer,
    "transformer_res": ModelTransformerRes,
    "cnn_ad": ModelCNNAd,
    "ad": ModelAd,
    "advit": ADVIT,
    "mnet": Mnet,
}

_FUSION_MODELS = {"transformer", "transformer_res", "ad"}


def build_model(name: str, dim: int = 128, depth: int = 3, heads: int = 4,
                dropout: float = 0.0, **kw):
    """Build a model by key with reference-default hyperparameters.

    For fusion models, dim_head defaults to dim // heads and mlp_dim to
    dim * 4, mirroring the reference drivers.
    """
    import dataclasses

    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    cls = _REGISTRY[key]
    if key in _FUSION_MODELS:
        kw.setdefault("dim_head", dim // heads)
        kw.setdefault("mlp_dim", dim * 4)
        kw.update(dim=dim, depth=depth, heads=heads, dropout=dropout)
    elif key in ("cnn", "cnn_ad", "single"):
        kw.update(dim=dim)
    # Drop hyperparameters a given architecture doesn't define (e.g.
    # use_pallas on pure-CNN models) so callers can pass a uniform config.
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kw.items() if k in fields})

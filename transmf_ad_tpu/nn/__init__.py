"""Network building blocks (flax.linen, channels-last)."""

from .attention import (  # noqa: F401
    Attention,
    CrossTransformer,
    CrossTransformerModAvg,
    FeedForward,
    PositionalEncoding1D,
    Transformer,
    token_pool,
)
from .blocks import (  # noqa: F401
    SFCN,
    ConvBNAct,
    SNet,
    avg_pool3d,
    global_avg_pool,
    max_pool3d,
    tokens_from_volume,
)
from .grl import revgrad  # noqa: F401
from .losses import adversarial_loss, cross_entropy, fa_loss, supcon_loss  # noqa: F401

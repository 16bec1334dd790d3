"""Model layer (L3): flax modules for the ALIGNN family."""

from alignn_tpu.nn.layers import (
    ALIGNNConv,
    Dense,
    EdgeGatedGraphConv,
    MaskedBatchNorm,
    MaskedLayerNorm,
    MLPLayer,
    RBFExpansion,
)
from alignn_tpu.nn.models import (
    ALIGNN,
    ALIGNNAtomWise,
    ALIGNNAtomWiseConfig,
    ALIGNNConfig,
    atomwise_forward,
    compute_cartesian_r,
)

__all__ = [
    "ALIGNNConv", "Dense", "EdgeGatedGraphConv", "MaskedBatchNorm",
    "MaskedLayerNorm", "MLPLayer", "RBFExpansion", "ALIGNN",
    "ALIGNNAtomWise", "ALIGNNAtomWiseConfig", "ALIGNNConfig",
    "atomwise_forward", "compute_cartesian_r",
]

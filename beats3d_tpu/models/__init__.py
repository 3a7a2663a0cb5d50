from .forest import DecisionTree, DecisionForest, PackedForest, forest_config
from .layered import LayeredDecisionForest

__all__ = [
    "DecisionTree",
    "DecisionForest",
    "PackedForest",
    "forest_config",
    "LayeredDecisionForest",
]

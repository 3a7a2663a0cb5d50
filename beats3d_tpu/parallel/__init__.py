from .mesh import make_mesh
from .eval_sharded import evaluate_forest_sharded
from .train_sharded import sharded_histogram_step, sharded_train_step

__all__ = [
    "make_mesh",
    "evaluate_forest_sharded",
    "sharded_histogram_step",
    "sharded_train_step",
]

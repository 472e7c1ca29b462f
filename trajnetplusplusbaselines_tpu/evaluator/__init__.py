from . import design_table
from . import driver
from . import trajnet_evaluator
from . import write_utils
from .design_table import Table
from .trajnet_evaluator import TrajnetEvaluator, collision_test, eval, trajnet_evaluate
from .write_utils import load_test_datasets, preprocess_test, write_predictions

__all__ = [
    "design_table",
    "driver",
    "trajnet_evaluator",
    "write_utils",
    "Table",
    "TrajnetEvaluator",
    "collision_test",
    "eval",
    "trajnet_evaluate",
    "load_test_datasets",
    "preprocess_test",
    "write_predictions",
]

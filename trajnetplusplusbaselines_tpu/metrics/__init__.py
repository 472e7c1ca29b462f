from . import batch
from . import trajectory
from .records import Categories, Metrics, SubCategories, Sub_categories
from .trajectory import average_l2, collision, final_l2, nll, topk

__all__ = [
    "batch",
    "trajectory",
    "Categories",
    "Metrics",
    "SubCategories",
    "Sub_categories",
    "average_l2",
    "collision",
    "final_l2",
    "nll",
    "topk",
]

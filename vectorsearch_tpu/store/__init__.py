from . import snapshots
from .db import CategoryRow, CentroidRow, DocumentRow, OwnerRow, Store

__all__ = [
    "snapshots",
    "Store",
    "OwnerRow",
    "CategoryRow",
    "CentroidRow",
    "DocumentRow",
]

from .ivm import IncrementalAggView
from .merge import delete, equality_delete_keys, merge_into, mor_delete_keys, update
from .table import CommitResult, ConcurrentCommitError, LakeTable, Snapshot, bucket_expr
from .views import ViewCatalog

__all__ = [
    "IncrementalAggView",
    "ViewCatalog",
    "CommitResult",
    "ConcurrentCommitError",
    "LakeTable",
    "Snapshot",
    "bucket_expr",
    "delete",
    "equality_delete_keys",
    "merge_into",
    "mor_delete_keys",
    "update",
]

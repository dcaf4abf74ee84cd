from .merge import delete, merge_into, update
from .table import CommitResult, ConcurrentCommitError, LakeTable, Snapshot, bucket_expr
from .views import ViewCatalog

__all__ = [
    "ViewCatalog",
    "CommitResult",
    "ConcurrentCommitError",
    "LakeTable",
    "Snapshot",
    "bucket_expr",
    "delete",
    "merge_into",
    "update",
]

from .merge import delete, merge_into, update
from .table import CommitResult, ConcurrentCommitError, LakeTable, Snapshot, bucket_expr

__all__ = [
    "CommitResult",
    "ConcurrentCommitError",
    "LakeTable",
    "Snapshot",
    "bucket_expr",
    "delete",
    "merge_into",
    "update",
]

from .file_ingest import (
    batch_ingest_with_manifest,
    create_stage,
    land_file,
    stream_ingest,
)

__all__ = ["batch_ingest_with_manifest", "create_stage", "land_file", "stream_ingest"]

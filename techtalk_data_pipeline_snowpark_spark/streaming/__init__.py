from .cdc_stream import stream_replay
from .event_time import (
    sliding_counts,
    stateful_sessions,
    stream_dedup,
    windowed_counts,
)
from .file_ingest import (
    batch_ingest_with_manifest,
    cloud_event_ingest,
    create_stage,
    land_cloud_event,
    land_file,
    stream_dedup_ingest,
    stream_ingest,
)

__all__ = [
    "batch_ingest_with_manifest",
    "cloud_event_ingest",
    "create_stage",
    "land_cloud_event",
    "land_file",
    "sliding_counts",
    "stateful_sessions",
    "stream_dedup",
    "stream_dedup_ingest",
    "stream_ingest",
    "stream_replay",
    "windowed_counts",
]

from .extract_stream import extract_stream, read_transcript_stream, start_extraction, turn_rate_monitor
from .state import ROCKSDB_PROVIDER, use_rocksdb_state

__all__ = [
    "extract_stream",
    "read_transcript_stream",
    "start_extraction",
    "turn_rate_monitor",
    "use_rocksdb_state",
    "ROCKSDB_PROVIDER",
]

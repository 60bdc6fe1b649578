from .extract_stream import extract_stream, read_transcript_stream, start_extraction, turn_rate_monitor

__all__ = ["extract_stream", "read_transcript_stream", "start_extraction", "turn_rate_monitor"]

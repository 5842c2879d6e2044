from .incremental import scd2_stream, windowed_event_counts

__all__ = ["scd2_stream", "windowed_event_counts"]

from .journeys import (
    hourly_event_stats,
    run_streaming_attribution,
    stream_events,
)

__all__ = ["hourly_event_stats", "run_streaming_attribution", "stream_events"]

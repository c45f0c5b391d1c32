from .ingest import run_streaming_ingest
from .joins import clicks_to_purchases
from .journeys import (
    hourly_event_stats,
    run_streaming_attribution,
    stream_events,
)
from .sessionize import streaming_sessionize

__all__ = [
    "clicks_to_purchases",
    "hourly_event_stats",
    "run_streaming_attribution",
    "run_streaming_ingest",
    "stream_events",
    "streaming_sessionize",
]

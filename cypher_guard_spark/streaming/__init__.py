from .validate_stream import stream_validate, stream_error_rates, run_available_now
from .link_state import stream_link_stats
from .dedup_stream import stream_dedup_exact, run_dedup_stream
from .decontam_stream import (
    stream_contamination_flags,
    stream_contamination_rates,
)

__all__ = [
    "stream_validate",
    "stream_error_rates",
    "run_available_now",
    "stream_link_stats",
    "stream_dedup_exact",
    "run_dedup_stream",
    "stream_contamination_flags",
    "stream_contamination_rates",
]

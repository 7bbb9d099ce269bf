from .validate_stream import stream_validate, stream_error_rates, run_available_now

__all__ = ["stream_validate", "stream_error_rates", "run_available_now"]
from .link_state import stream_link_stats  # noqa: F401

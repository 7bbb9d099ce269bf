from .validate_stream import stream_validate, stream_error_rates, run_available_now

__all__ = ["stream_validate", "stream_error_rates", "run_available_now"]

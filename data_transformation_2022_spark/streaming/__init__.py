from .pipelines import sessionize_batch, stream_hourly_rollup, stream_sessionize

__all__ = ["sessionize_batch", "stream_hourly_rollup", "stream_sessionize"]

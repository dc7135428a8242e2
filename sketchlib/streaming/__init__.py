"""Structured Streaming sketch maintenance: foreachBatch global
sketches (exactly-once via batch-id idempotence) and
applyInPandasWithState per-key streaming sketches."""

from sketchlib.streaming.stream import (
    run_streaming_sketch,
    streaming_grouped_sketch,
)

__all__ = ["run_streaming_sketch", "streaming_grouped_sketch"]

"""Structured Streaming surface — SURVEY §2 C55–C60, streaming side.

The batch corpus (corpus/eventtime.py) defines the window semantics; this
package runs the *same* expressions under readStream with watermarks, so
batch results are the oracle for stream results (tests/test_streaming.py
asserts parity). That is the Spark-idiomatic contract: one query, two
execution modes.
"""

from .windows import (
    stream_events_from_dir,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_events,
    run_to_memory,
)
from .stateful import running_max_stateful
from .ingest import stream_into_engine

__all__ = [
    "stream_into_engine",
    "stream_events_from_dir",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_events",
    "run_to_memory",
    "running_max_stateful",
]

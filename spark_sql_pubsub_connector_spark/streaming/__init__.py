"""Structured-streaming pipelines built on the pubsub connector."""

from .pipelines import (  # noqa: F401
    foreach_batch_fanout,
    read_stream,
    seed_topic_from_events,
    write_stream,
)

"""Pub/Sub-shaped streaming source + sink on the Python DataSource API.

Re-expresses the reference connector's machinery (SURVEY.md §2.1
S1-S19) Spark-first:

  options.py     option validation + partition-planning value objects
  broker.py      broker abstraction: file-backed fake (cross-process)
                 + real-client stub gated behind an import-try
  registry.py    single-consumer stream guard (S12)
  monitor.py     backlog-driven dynamic partition planning (S13/S6)
  datasource.py  the DataSource / stream reader / stream writer (the rest)
"""

from .datasource import (  # noqa: F401
    PUBSUB_READ_SCHEMA,
    PUBSUB_WRITE_SCHEMA,
    PubsubDataSource,
    register_pubsub,
)

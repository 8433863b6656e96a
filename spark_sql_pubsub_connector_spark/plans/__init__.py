"""Declarative query corpus: DataFrame builders + DuckDB oracle SQL.

Importing this package registers every query module into the central
registry (``plans.registry``); ``__spark_entry__.py`` re-exports the
registry as the driver's ``queries()`` / ``oracle_sql()`` contract.
"""

from . import relational  # noqa: F401
from .registry import all_specs, oracle_sql, queries  # noqa: F401


def _load_optional() -> None:
    # Later-phase modules register themselves on import; keep each
    # optional so a broken module never takes down the whole corpus.
    for mod in ("dedup", "similarity", "text", "multimodal", "streaming_ops"):
        try:
            __import__(f"{__name__}.{mod}")
        except ImportError:
            pass


_load_optional()

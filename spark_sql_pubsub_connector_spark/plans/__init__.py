"""Declarative query corpus: DataFrame builders + DuckDB oracle SQL.

Importing this package registers every query module into the central
registry (``plans.registry``); ``__spark_entry__.py`` re-exports the
registry as the driver's ``queries()`` / ``oracle_sql()`` contract.
"""

from . import relational  # noqa: F401
from .caching import persist_tracked, release_caches  # noqa: F401
from .registry import all_specs, oracle_sql, queries  # noqa: F401


from . import dedup  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import streaming_ops  # noqa: F401,E402
from . import temporal  # noqa: F401,E402
from . import text  # noqa: F401,E402

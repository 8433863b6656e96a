"""Exact (integer-scaled) aggregation over fixed-decimal doubles.

The driver's correctness gate hash-compares Spark results against
DuckDB. Plain ``sum(double)`` is NOT portable across engines: the two
sum in different orders (sequential vs pairwise, partial aggregates),
so the low bits differ, and ``round(sum(x), k)`` flips whenever the
true value sits on a rounding boundary — which fixed-decimal business
data hits constantly (e.g. ``avg`` of 2-decimal values over n=8 ends
in ...25 at 4 decimals).

Recipe: snap each term to an integer at its exact decimal scale
(``round(x * 10^s)`` — float noise is ~1e-6 of the grid, so the snap is
unambiguous), sum as BIGINT (exact, order-independent), then divide
back to double. Every engine performs the identical IEEE-754 division
on the identical integer, so results are bit-equal with NO tolerance.

Overflow headroom: BIGINT holds ~9.2e18; at scale=4 that is ~9.2e14 in
data units per aggregate group — far beyond the 100 TB target's
per-group sums for money-typed columns (and Spark raises on overflow
under ANSI rather than corrupting).

The SQL-text twins (`sql_esum`/`sql_eavg`) keep the DuckDB oracle
expression structurally identical to the Spark plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _scaled(expr: Column | str, scale: int) -> Column:
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.round(col * (10**scale), 0).cast("long")


def esum(expr: Column | str, scale: int = 2) -> Column:
    """Exact sum of a fixed-decimal double, returned as double."""
    return F.sum(_scaled(expr, scale)).cast("double") / F.lit(10**scale)


def eavg(expr: Column | str, scale: int = 2) -> Column:
    """Exact-sum-based average: (sum_scaled / 10^s) / n, all IEEE-deterministic."""
    return (
        F.sum(_scaled(expr, scale)).cast("double") / F.lit(10**scale)
    ) / F.count(F.lit(1)).cast("double")


def sql_esum(expr: str, scale: int = 2, alias: str | None = None) -> str:
    s = 10**scale
    sql = f"CAST(sum(CAST(round(({expr}) * {s}, 0) AS BIGINT)) AS DOUBLE) / {s}"
    return f"{sql} AS {alias}" if alias else sql


def sql_eavg(expr: str, scale: int = 2, alias: str | None = None) -> str:
    s = 10**scale
    sql = (
        f"(CAST(sum(CAST(round(({expr}) * {s}, 0) AS BIGINT)) AS DOUBLE) / {s})"
        f" / CAST(count(*) AS DOUBLE)"
    )
    return f"{sql} AS {alias}" if alias else sql

"""Cross-engine text primitives (tokenize / shingle / portable hash).

Every helper has a Spark Column form and a DuckDB SQL-text twin that
produce byte-identical results, because the driver's correctness gate
hash-compares the two engines (see ``functions.exact`` for the same
pattern on numeric aggregates):

  - tokenization = ``split(lower(trim(text)), '\\s+')`` — both engines
    use regex split with identical semantics on non-empty trimmed text;
  - the only portable hash is ``md5`` (lowercase hex in both engines);
    Spark's ``xxhash64``/``hash`` have no DuckDB counterpart, so MinHash
    takes the *lexicographic* min of fixed-width hex strings, which
    equals the numeric min of the underlying 128-bit values;
  - numeric quantization uses ``floor(x + 0.5)`` instead of ``round``
    so half-even vs half-up rounding differences can never appear.

Spark arrays are 0-indexed (``w[0]``), DuckDB lists 1-indexed — the
shingle builders encode the shift explicitly rather than sharing text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of lower(trim(col)); [] only for empty text."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def sql_tokens(col: str = "text") -> str:
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def shingles(words: str = "w", n: int = 3) -> Column:
    """Word n-grams as space-joined strings (requires size(words) >= n;
    callers must filter first — Spark's ``sequence`` runs *descending*
    for a negative span instead of returning empty)."""
    parts = ", ".join(f"{words}[i + {j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size({words}) - {n}), i -> concat_ws(' ', {parts}))"
    )


def sql_shingles(words: str = "w", n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-indexed lists)."""
    parts = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(n))
    return f"list_transform(range(1, len({words}) - {n - 2}), i -> {parts})"


def md5_str(col: Column) -> Column:
    """Lowercase hex md5 of a string column (DuckDB twin: ``md5(col)``)."""
    return F.md5(F.encode(col, "UTF-8"))


def hex_prefix_int(col: Column, nchars: int = 8) -> Column:
    """First ``nchars`` hex digits of a lowercase-hex string column as a
    BIGINT (Spark side: ``conv`` base-16 → base-10). 15 chars max (60
    bits) keeps the value inside BIGINT."""
    assert nchars <= 15
    return F.conv(F.substring(col, 1, nchars), 16, 10).cast("long")


def sql_hex_prefix_int(expr: str, nchars: int = 8) -> str:
    """DuckDB twin of :func:`hex_prefix_int` — DuckDB has no base-conv
    function, so the digit values are summed positionally via strpos
    (generated, exact integer arithmetic)."""
    assert nchars <= 15
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {p + 1}, 1)) - 1) * "
        f"CAST({16 ** (nchars - 1 - p)} AS BIGINT)"
        for p in range(nchars)
    )
    return f"({terms})"


def quantize(col: Column, scale: int = 10_000) -> Column:
    """Deterministic fixed-point quantization of a float column.

    ``floor(x * scale + 0.5)`` on the double-widened value: both engines
    perform the identical IEEE-754 multiply-add-floor, so the resulting
    BIGINT grid is bit-equal with no round-half ambiguity.
    DuckDB twin: ``CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)``.
    """
    return F.floor(col.cast("double") * scale + F.lit(0.5)).cast("long")


def sql_quantize(expr: str, scale: int = 10_000) -> str:
    return f"CAST(floor(CAST({expr} AS DOUBLE) * {scale} + 0.5) AS BIGINT)"

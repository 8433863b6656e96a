"""Central registry of oracle-checked queries.

Each :class:`QuerySpec` pairs a PySpark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables — the
driver's correctness gate (BASELINE.md "operative baseline"). Queries
whose semantics are not SQL-expressible (stateful streaming, UDF-backed
decode) set ``oracle=None`` and get a rows-only check.

Contract notes (from /root/repo/__spark_entry__.py):
  - every computed column must carry the SAME alias in both the Spark
    plan and the oracle SQL (the driver sorts columns by name before
    hashing);
  - double-valued aggregates are rounded identically on both sides so
    float summation-order differences between engines cannot flip the
    value hash;
  - timestamps are exported as epoch microseconds (bigint) or
    'yyyy-MM-dd' strings — never raw timestamp columns — to avoid
    timezone/precision representation differences;
  - EVERY integer aggregate exported from an oracle must be wrapped in
    ``CAST(... AS BIGINT)``: DuckDB ``sum(BIGINT)``/``list_sum`` return
    HUGEINT, which pandas renders as float64 (``3.0``) while Spark
    returns int64 (``3``) — identical values, different driver hash
    (tests/test_oracle_dtypes.py enforces this corpus-wide);
  - never export raw binary columns: ``bytearray`` is unhashable in the
    driver's pandas canonicalizer — export ``lower(hex(...))`` instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    # SQL text, or a zero-arg factory returning it. A factory re-composes
    # at access time, so oracles that embed a mode-dependent fragment
    # (the exact-agg accumulator knob, functions/exact.py) stay in
    # lockstep with the Spark plan even when the mode flips after
    # import; `all_specs()`/`oracle_sql()` always hand consumers str.
    oracle: str | Callable[[], str] | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def query(
    name: str,
    oracle: str | Callable[[], str] | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Builder) -> Builder:
        register(QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench))
        return fn

    return deco


def _resolved(spec: QuerySpec) -> QuerySpec:
    if callable(spec.oracle):
        return replace(spec, oracle=spec.oracle())
    return spec


def all_specs() -> dict[str, QuerySpec]:
    return {n: _resolved(s) for n, s in _REGISTRY.items()}


def queries() -> dict[str, Builder]:
    return {n: s.build for n, s in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        n: (s.oracle() if callable(s.oracle) else s.oracle)
        for n, s in _REGISTRY.items()
        if s.oracle is not None
    }


def observed_metrics(df) -> dict[str, dict]:
    """Named ``observe()`` metrics from ``df``'s last execution, e.g.
    the q17/q109 bucket-cap overflow counters::

        pairs = queries()["q17_dedup_minhash_lsh"](spark, sf_dir)
        pairs.collect()
        observed_metrics(pairs)["q17_bucket_cap"]["routed_members"]

    Metrics populate when an action runs on THIS DataFrame object
    (``collect``/``write``); derived DataFrames (``df.count()`` builds a
    new plan) report through their own execution. Returns
    {metric_name: {column: value}}; a metric whose query has not run
    yet surfaces with null values.

    Conversion is driven by each metric column's declared dataType
    (ADVICE r4: parse-guessing through str() misreported a genuinely
    string-typed metric that happens to look numeric). Diagnostics
    helper only — it reaches through py4j internals
    (``_jdf.queryExecution``, no public PySpark surface yet) and is
    not on any query path.

    Why not the public ``pyspark.sql.Observation`` API (VERDICT r9
    #8, re-checked r10 on pyspark 4.1.2): (a) it must be threaded in
    at plan-build time as an ``Observation`` instance, but the query
    bodies use string-named ``observe()`` and are frozen; (b) one
    ``Observation`` serves exactly one action, while this helper reads
    whatever the frame's last execution produced; (c) ``Observation``
    does not support streaming Datasets — the public streaming path is
    ``StreamingQueryProgress.observedMetrics`` (which streaming/
    pipelines consumers can use directly; this helper covers the batch
    frames). The reach-through therefore stays, version-brittle but
    diagnostics-only."""
    out: dict[str, dict] = {}
    om = df._jdf.queryExecution().observedMetrics()
    it = om.iterator()
    while it.hasNext():
        kv = it.next()
        row = kv._2()
        schema = row.schema()
        vals = {}
        for i in range(schema.length()):
            name = schema.apply(i).name()
            v = row.get(i)
            if v is None:
                vals[name] = None
                continue
            tname = schema.apply(i).dataType().typeName()
            if tname in ("byte", "short", "integer", "long"):
                vals[name] = int(str(v))
            elif tname in ("float", "double") or tname.startswith("decimal"):
                vals[name] = float(str(v))
            elif tname == "boolean":
                vals[name] = str(v).lower() == "true"
            else:
                vals[name] = str(v)
        out[str(kv._1())] = vals
    return out

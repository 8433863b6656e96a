"""Cross-engine boundary pinning for q22's IVF parameter derivation.

The r6 q22 oracle mirrors the whole count → k → stride chain in SQL
(ceil division, LEAST/GREATEST clamps, integer floor division, the
md5-prefix hash-mod centroid sample, the min-vec_id fallback). Each
clamp has a boundary where an engine-mismatch would first appear —
e.g. Python ``-(-n // 256)`` vs DuckDB ``ceil(n / 256.0)``, or
Python ``n // k`` vs DuckDB ``//`` — and the driver only ever runs
one corpus size per scale factor, so this test runs the REGISTERED
q22 and its REGISTERED oracle side by side on corpora sized exactly
at those boundaries:

  n = 0    empty table (mn is NULL, both sides must yield 0 rows)
  n = 1    hash sample likely empty → min-vec_id fallback alone
  n = 3    stride clamp floor (GREATEST(2, …))
  n = 255  k = 1 just below the cell-size knob
  n = 256  k = 1 at the knob exactly
  n = 257  k flips to 2, stride halves
  n = 500  the full fixture (k = 2, stride 250)

A mismatch in any derivation step changes the centroid set, hence the
cells, hence the emitted pairs — so comparing final rows pins every
step at once.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs, oracle_sql

from .conftest import SF_DIR

SIZES = (0, 1, 3, 255, 256, 257, 500)


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    """One embeddings.parquet per boundary size, cut from the fixture
    (deterministic vec_id prefix, so both engines read identical
    bytes)."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dirs = {}
    for n in SIZES:
        d = str(tmp_path_factory.mktemp(f"emb{n}"))
        base.filter(f"vec_id < {n}").coalesce(1).write.mode("overwrite").parquet(
            f"{d}/embeddings.parquet"
        )
        dirs[n] = d
    return dirs


def _compare_engines(spark, d: str) -> tuple[list, list]:
    sdf = all_specs()["q22_embedding_neardup"].build(spark, d)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(r[c] for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    con.execute(
        # Spark writes a directory of part files; glob them for DuckDB
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    cur = con.execute(oracle_sql()["q22_embedding_neardup"])
    names = [c[0] for c in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    drows = sorted(
        [tuple(row[i] for i in order) for row in cur.fetchall()], key=repr
    )
    return srows, drows


@pytest.mark.parametrize("n", SIZES)
def test_q22_oracle_matches_at_derivation_boundary(spark, corpora, n):
    srows, drows = _compare_engines(spark, corpora[n])
    assert srows == drows, f"n={n}: {len(srows)} spark vs {len(drows)} duckdb rows"
    if n >= 256:
        # past the knob the blocking must actually find pairs on the
        # fixture — guards against a silently-empty centroid set
        assert srows, f"n={n}: no pairs emitted"


def test_q22_oracle_matches_on_degenerate_corpus(spark, tmp_path):
    """Cross-ENGINE equality on a corpus with empty and truncated
    embeddings — the degenerate class the r5 vecops guards exist for.
    The plain degenerate test only proves Spark survives; this proves
    both engines agree on what such rows contribute: a degenerate
    vector can be hash-sampled as a centroid, can be the min-vec_id
    fallback, NULL-sorts last in the assignment argmax, and its pairs
    are excluded by the NULL-guarded cosine on BOTH engines.

    r7 (ADVICE r6): the corpus also injects OVER-length vectors (70
    elements). Two over-length vectors have a defined 70-term dot —
    Spark's unsliced zip_with spans the full length — and the old
    DuckDB clamp summed only 64 terms, a silent non-NULL value
    divergence this differential now catches; over×full stays NULL on
    both engines (mismatched lengths).

    r11 (ADVICE r10): the corpus also injects ELEMENT-level NULLs
    (full-length arrays with one NULL slot). On the JVM/DuckDB chain
    every dot touching such a vector is NULL; on the numpy path the
    NULL arrives as NaN, where floor/int64 is platform-defined and an
    int64 term sum can wrap to a bogus positive norm — the _assign /
    _nd_cand_set isnan masks exist exactly so these rows pair with
    nothing on BOTH engines, which this differential now proves."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "degen")
    over = F.concat(
        "embedding",
        F.array(*[F.lit(0.5 + 0.1 * i).cast("float") for i in range(6)]),
    )
    null_elem = F.transform(
        "embedding",
        lambda x, i: F.when(i == F.lit(1), F.lit(None).cast("float")).otherwise(x),
    )
    (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 7 == 0, F.array().cast("array<float>"))
            .when(F.col("vec_id") % 7 == 1, F.slice("embedding", 1, 3))
            .when(F.col("vec_id") % 7 == 2, over)
            .when(F.col("vec_id") % 7 == 3, null_elem)
            .otherwise(F.col("embedding")),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    srows, drows = _compare_engines(spark, out)
    assert srows == drows, f"{len(srows)} spark vs {len(drows)} duckdb rows"
    assert srows, "healthy rows must still pair despite degenerate neighbors"

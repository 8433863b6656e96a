"""Degenerate-input sweep: every registered batch query must execute
cleanly on a ZERO-ROW corpus, a SINGLE-ROW corpus, and a NULL-INJECTED
corpus.

The driver's fixtures are always populous, so the oracle mirror never
exercises the empty-group / empty-join / null-aggregate paths a real
deployment hits constantly (a fresh partition, a filter that matches
nothing, a source whose day's data is one document). Spark semantics
make most of these safe by construction — empty aggregates yield null,
empty joins yield empty — but driver-side derivations (collected
thresholds, convergence loops, broadcast build sides, percentile
literals) can raise on ``None``/empty instead. This sweep pins that
every query degrades to an empty-or-small result, never an exception.

Single-row fixtures also break referential integrity on purpose (one
customer, one order that likely doesn't reference it): joins must
produce empty output, not errors.

The null-injected corpus nulls ~20% of the soft fields real pipelines
actually see nulls in (documents.text/lang/source, events.user_id/
event_type/value/props, embeddings.embedding/label) while keeping the
tables populous. This is the sweep that caught the multimodal
mapInPandas helpers calling ``len``/``bytes`` on null payloads
(q27/q28/q62/q96, fixed round 5 with SQL null-in-null-out semantics);
it pins every Python-boundary operator against the nulls that a real
100 TB corpus is guaranteed to contain.

Runs against schema-faithful fixtures derived from the sf0.001 parquet
(``limit 0`` / ``limit 1`` per table), so column names, types, and
nullability match production exactly. Streaming queries are excluded:
their builders seed brokers from the events table and are covered by
the dedicated streaming/differential suites.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs

from .conftest import SF_DIR, TABLES

SPECS = all_specs()
BATCH = sorted(n for n, s in SPECS.items() if "streaming" not in s.tags)


def _make_fixture(spark, n_rows: int) -> str:
    out = tempfile.mkdtemp(prefix=f"edge-sf{n_rows}-")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(n_rows)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def empty_dir(spark):
    out = _make_fixture(spark, 0)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def one_row_dir(spark):
    out = _make_fixture(spark, 1)
    yield out
    shutil.rmtree(out, ignore_errors=True)


_NULL_COLS = {
    "documents": ("text", "lang", "source"),
    "events": ("user_id", "event_type", "value", "props"),
    "embeddings": ("embedding", "label"),
}


@pytest.fixture(scope="module")
def nulls_dir(spark):
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="edge-sfnulls-")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        key = df.columns[0]
        for c in _NULL_COLS.get(t, ()):
            # deterministic ~20% nulls, keyed so reruns are stable
            df = df.withColumn(
                c,
                F.when(
                    F.xxhash64(F.col(key), F.lit(c)) % 5 == 0, None
                ).otherwise(F.col(c)),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", BATCH)
def test_zero_row_corpus(name, spark, empty_dir):
    df = SPECS[name].build(spark, empty_dir)
    assert df.count() >= 0  # must plan and execute, not raise


@pytest.mark.parametrize("name", BATCH)
def test_single_row_corpus(name, spark, one_row_dir):
    df = SPECS[name].build(spark, one_row_dir)
    assert df.count() >= 0


_ADVERSARIAL_TEXT = (
    "",  # empty string (distinct from null)
    " \t\n  ",  # whitespace only
    "😀🎉🚀 emoji only 🌍",
    "中文文本测试，没有空格的长句子组成的文档内容在这里继续延伸",
    "مرحبا بالعالم هذا نص عربي من اليمين إلى اليسار",
    "mixed العربية and English و 中文 text",
    "\x00\x01\x02 control \x1f chars \x7f",
    "a",  # single char
    "word " * 5000,  # very long, highly repetitive
    "x" * 50_000,  # one enormous token
    "line1\nline2\r\nline3\ttabbed",
    "ünïcödé àccénts çédille ñ",
)


@pytest.fixture(scope="module")
def adversarial_dir(spark):
    """sf0.001 with ~1/3 of document texts replaced by adversarial
    strings: empty, whitespace-only, emoji/CJK/RTL, control chars,
    50k-char single tokens, highly repetitive long docs. Tokenizers,
    shinglers, hashers, and codecs must stay total over these."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="edge-sfadv-")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            expr = F.when(
                F.col("doc_id") % 3 == 0,
                F.element_at(
                    F.array(*[F.lit(s) for s in _ADVERSARIAL_TEXT]),
                    (F.col("doc_id") % len(_ADVERSARIAL_TEXT) + 1).cast("int"),
                ),
            ).otherwise(F.col("text"))
            df = df.withColumn("text", expr).withColumn(
                "n_chars", F.length("text")
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def corrupt_emb_dir(spark):
    """sf0.001 with degenerate embeddings: every 7th vector an EMPTY
    array (zero norm — cosine undefined), every 7th+1 truncated to 3
    dims (out-of-range reads for the fixed-DIM expressions). Caught
    two ANSI-mode stage-killers in round 5: DIVIDE_BY_ZERO in
    cosine_q_expr and INVALID_ARRAY_INDEX in bucket_exprs."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="edge-sfemb-")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 7 == 0, F.array().cast("array<float>"))
                .when(F.col("vec_id") % 7 == 1, F.slice("embedding", 1, 3))
                .otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)


_EMBEDDING_QUERIES = sorted(
    n
    for n in BATCH
    if n.split("_")[0]
    in {
        "q20", "q21", "q22", "q49", "q57", "q61", "q66",
        "q76", "q82", "q83", "q90", "q111",
    }
)


@pytest.mark.parametrize("name", _EMBEDDING_QUERIES)
def test_corrupt_embeddings_corpus(name, spark, corrupt_emb_dir):
    df = SPECS[name].build(spark, corrupt_emb_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", BATCH)
def test_adversarial_text_corpus(name, spark, adversarial_dir):
    df = SPECS[name].build(spark, adversarial_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", BATCH)
def test_null_injected_corpus(name, spark, nulls_dir):
    df = SPECS[name].build(spark, nulls_dir)
    assert df.count() >= 0


def test_stateful_streaming_survives_null_events(spark, nulls_dir):
    """The stateful streaming folds (q33 applyInPandasWithState, q48
    transformWithState) must apply SQL sum semantics to null event
    values — skip them — instead of crashing the state worker on the
    NaN→int64 cast. The null corpus nulls ~20% of events.value (and
    user_id/event_type, exercising null grouping keys)."""
    for name in ("q33_stream_stateful_counts", "q48_stream_transform_with_state"):
        assert SPECS[name].build(spark, nulls_dir).count() > 0


def test_null_payloads_yield_null_features_not_errors(spark, nulls_dir):
    """The multimodal Python boundary follows SQL null semantics: a
    null payload row survives with null feature columns (length(NULL)
    is NULL), it neither crashes the Arrow worker nor disappears."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{nulls_dir}/documents.parquet")
    n_null = docs.filter(F.col("text").isNull()).count()
    n_docs = docs.count()
    assert 0 < n_null < n_docs  # the fixture really injected some

    df = SPECS["q27_mm_decode_meta"].build(spark, nulls_dir)
    assert df.count() == n_docs
    nulls = df.filter(F.col("content_md5").isNull())
    assert nulls.count() == n_null
    assert nulls.filter(F.col("byte_len").isNotNull()).count() == 0

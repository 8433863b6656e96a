"""Training-data pipeline operators over ``documents`` (SURVEY.md §2.3
extension surface — the curation steps an LLM-scale corpus pipeline
runs between raw crawl and tokenizer):

  q44  test-set decontamination — n-gram overlap join train↔test
  q45  deterministic stratified sampling — hash-bucket per stratum
  q46  sequence packing — docs → fixed-token context windows
  q47  canonical-representative dedup map — keep-best by quality rank

Scale design: q44 joins on a 48-bit shingle hash with a document-
frequency cap applied BEFORE the join, so ubiquitous n-grams ("of the
and") can never explode the shuffle — Σ|df-capped bucket|² bounds the
join, the same blocking discipline as dedup.py's LSH candidates; its
keyed shingle table is materialized once (localCheckpoint by default,
a durable parquet stage under $SPARK_GRAFT_STAGE_DIR on clusters). q45 is a pure scan + hash filter (zero
shuffle). q46 packs hierarchically: running sum per (source,
doc_id-range bucket) — every window partition bounded at _PACK_BUCKET
docs — plus a per-bucket exclusive prefix offset from a
corpus/_PACK_BUCKET-sized second aggregate; bit-identical to the flat
per-source running sum the oracle specifies, but no shard ever
serializes through one task. q47 is one window over the fingerprint
partition — WindowGroupLimit-style per-group selection, no array
state.

Cross-engine: md5-only hashing (functions/textops), integer token
arithmetic, ``CAST(... AS BIGINT)`` around every exported integer
aggregate (DuckDB HUGEINT rule, plans/registry.py).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.textops import (
    hex_prefix_int,
    shingles,
    sql_hex_prefix_int,
    sql_shingles,
    sql_tokens,
    tokens,
)
from .caching import persist_tracked
from .registry import query
from .tables import load_table

# q44 knobs: test corpus = one source shard; shingles above the df cap
# are dropped (they carry no contamination signal and would dominate
# the join); a pair is contaminated at >= MIN_SHARED distinct shingles.
_TEST_SOURCE = "src0"
_NGRAM = 3
_DF_CAP = 10
_MIN_SHARED = 3
_KEY_HEX = 12  # 48-bit shingle keys

# q46: context-window capacity in whitespace tokens, and the doc_id
# range each packing bucket covers. Both powers of two so the one
# double division in the bin computation stays exact cross-engine.
_PACK_CAPACITY = 256
_PACK_BUCKET = 128


def _materialize(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    """Materialized intermediate stage: compute ``df`` once, truncate
    its lineage, and hand every downstream consumer the stored copy.

    r16 (VERDICT r15 #4's prescribed three-way A/B, guide §5.4): the
    default is now ``localCheckpoint(eager=True)`` — executor-local
    blocks, no filesystem round-trip. Interleaved 4-round A/B at
    sf0.1, build+action timed like bench.py's run_once
    (``R16AB_q44_buildtimed.json``): first-run median 1.76 s
    (localCheckpoint) vs 2.07 (the previous write-parquet-and-
    read-back stage) vs 2.10 (plain ``persist()``, whose three
    consumers re-analyze the full shingle+md5+join subtree). persist
    wins WARM repeats (0.84 — its CacheManager entry plan-matches the
    next run's rebuild, localCheckpoint leaves cannot) but the
    driver's scoreboard is the cold first run, where localCheckpoint
    is pairwise best. Set ``SPARK_GRAFT_STAGE_DIR`` to a shared
    filesystem path to restore the durable parquet stage on a real
    cluster, where losing an executor must re-read the stage instead
    of killing the query — the trade q54's iteration loop documents."""
    root = os.environ.get("SPARK_GRAFT_STAGE_DIR")
    if not root:
        return df.localCheckpoint(eager=True)
    path = os.path.join(
        root, "pubsub_spark_stage", spark.sparkContext.applicationId, name
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# --------------------------------------------------------------------------
# q44 — test-set decontamination (n-gram overlap join)
# --------------------------------------------------------------------------
@query(
    "q44_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, {sql_tokens('text')} AS w FROM documents
),
sh AS (
  SELECT doc_id, source, unnest(list_distinct({sql_shingles('w', _NGRAM)})) AS s
  FROM tok WHERE len(w) >= {_NGRAM}
),
keyed AS (
  SELECT doc_id, source, {sql_hex_prefix_int('md5(s)', _KEY_HEX)} AS k FROM sh
),
rare AS (
  SELECT k FROM keyed GROUP BY k HAVING count(DISTINCT doc_id) <= {_DF_CAP}
),
fk AS (SELECT keyed.* FROM keyed JOIN rare USING (k)),
pairs AS (
  SELECT tr.doc_id AS train_doc_id, te.doc_id AS test_doc_id,
         count(*) AS n_shared
  FROM fk tr JOIN fk te ON tr.k = te.k
  WHERE tr.source <> '{_TEST_SOURCE}' AND te.source = '{_TEST_SOURCE}'
  GROUP BY 1, 2
)
SELECT train_doc_id, test_doc_id, CAST(n_shared AS BIGINT) AS n_shared
FROM pairs
WHERE n_shared >= {_MIN_SHARED}
""",
    tags=("pipeline", "decontaminate", "join"),
    bench=True,
)
def q44_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: find training documents sharing >=
    MIN_SHARED distinct token {3}-grams with any held-out (test-shard)
    document — the overlap audit every LLM training run owes its evals.

    Shape: shingle → 48-bit md5 key → document-frequency cap (drops
    ubiquitous n-grams BEFORE the join, the scale guard) → train↔test
    hash join on the key → per-pair distinct-shingle count. The df cap
    bounds every key's bucket at DF_CAP docs, so the join output is
    Σ|bucket_train|·|bucket_test| ≤ DF_CAP² per key — never O(n²).

    The test-key-filtered shingle table feeds three consumers (the
    df-count pass and both join sides), so it is materialized ONCE
    (:func:`_materialize` — localCheckpoint by default since r16, a
    durable parquet stage under ``$SPARK_GRAFT_STAGE_DIR`` on real
    clusters; see the helper's docstring for the measured A/B) instead
    of letting Catalyst re-evaluate the shingle+md5+join subtree per
    consumer — the same one materialization real decontamination
    pipelines pay, holding only the test-key survivors, not the full
    keyed corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "source", tokens("text").alias("w"))
    sh = (
        tok.filter(F.size("w") >= _NGRAM)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(shingles("w", _NGRAM))).alias("s"),
        )
    )
    keyed = sh.select(
        "doc_id",
        "source",
        hex_prefix_int(F.md5(F.encode(F.col("s"), "UTF-8")), _KEY_HEX).alias("k"),
    )
    # Only keys that occur in the TEST shard can ever produce a pair,
    # and the df-cap of a key not in the test shard is irrelevant — so
    # the corpus is pre-filtered by the (small) test key set before
    # any aggregate or join. The test key set is built from a scan
    # whose source=test filter pushes into parquet (a shard orders of
    # magnitude smaller than the corpus), so the expensive full-corpus
    # shingle+md5 subtree is evaluated exactly once, into the join
    # below; only the test-key-filtered survivors — ~|test| x DF_CAP
    # rows — are materialized for the df-count and both join sides.
    # AQE broadcasts the key set when it fits and falls back to a hash
    # join when a huge test shard doesn't.
    te_keys = (
        keyed.filter(F.col("source") == _TEST_SOURCE).select("k").distinct()
    )
    kt = keyed.join(te_keys, "k")
    kt = _materialize(spark, kt, "q44_kt")
    rare = (
        kt.groupBy("k")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= _DF_CAP)
        .select("k")
    )
    fk = kt.join(rare, "k")
    tr = fk.filter(F.col("source") != _TEST_SOURCE).select(
        F.col("k"), F.col("doc_id").alias("train_doc_id")
    )
    te = fk.filter(F.col("source") == _TEST_SOURCE).select(
        F.col("k"), F.col("doc_id").alias("test_doc_id")
    )
    return (
        tr.join(te, "k")
        .groupBy("train_doc_id", "test_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


# --------------------------------------------------------------------------
# q45 — deterministic stratified sampling
# --------------------------------------------------------------------------
@query(
    "q45_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {sql_hex_prefix_int("md5(CAST(doc_id AS VARCHAR))", 8)} % 5 = 0
""",
    tags=("pipeline", "sample"),
)
def q45_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample: keep a document iff the first 32 bits
    of md5(doc_id) fall in bucket 0 of 5. Hash sampling (vs random) is
    what a training pipeline needs — reproducible across reruns,
    engines, and partitionings, and consistent per key so downstream
    joins on the sample stay aligned. Pure scan + filter: zero
    shuffle, embarrassingly parallel at any scale; stratification is
    free because the hash is uniform within every (lang, source)
    stratum."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        hex_prefix_int(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 8)
        % 5
    )
    return docs.filter(bucket == 0).select("doc_id", "lang", "source", "n_chars")


# --------------------------------------------------------------------------
# q46 — sequence packing into fixed-token context windows
# --------------------------------------------------------------------------
@query(
    "q46_sequence_packing",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, len({sql_tokens('text')}) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
),
b AS (
  SELECT source,
         CAST(floor(CAST(cum - n_tok AS DOUBLE) / {_PACK_CAPACITY}) AS BIGINT)
           AS bin,
         doc_id, n_tok
  FROM c
)
SELECT source, bin,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM b
GROUP BY source, bin
""",
    tags=("pipeline", "packing", "window"),
)
def q46_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in stable doc_id order) to
    fixed-capacity context windows by running token count — the
    pretraining batch-construction step. A document starting before a
    {capacity}-token boundary joins that window (windows may overflow
    by one doc, the standard greedy-order approximation).

    Hierarchical running sum (the oracle's single
    ``sum() OVER (PARTITION BY source ORDER BY doc_id)`` would funnel
    each source shard — cardinality ~20 — through one window task,
    ~5 TB/task at 100 TB): docs are bucketed into deterministic
    ``doc_id DIV {bucket}`` ranges, the running sum is computed per
    (source, bucket) — every window partition bounded at {bucket}
    docs — and each bucket's exclusive prefix total (from a tiny
    second aggregate, |corpus|/{bucket} rows) shifts the local sums
    back to the global cumulative value. Two fine-grained shuffles
    replace one serialized window; the result is bit-identical to the
    flat running sum, which stays the oracle spec."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("n_tok"),
        F.expr(f"doc_id DIV {_PACK_BUCKET}").alias("bucket"),
    )
    # per-(source, bucket) running sum: every partition holds at most
    # _PACK_BUCKET docs regardless of corpus size
    wl = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.withColumn("lcum", F.sum("n_tok").over(wl))
    # exclusive prefix total per bucket within its source — the second
    # aggregate is _PACK_BUCKET× smaller than the corpus
    tot = d.groupBy("source", "bucket").agg(F.sum("n_tok").alias("tot"))
    wo = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = tot.select(
        "source",
        "bucket",
        F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("pre"),
    )
    c2 = c.join(off, ["source", "bucket"])
    b = c2.select(
        "source",
        F.floor(
            (F.col("pre") + F.col("lcum") - F.col("n_tok")).cast("double")
            / _PACK_CAPACITY
        ).cast("long").alias("bin"),
        "doc_id",
        "n_tok",
    )
    return b.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# q47 — canonical-representative dedup map (keep-best by quality rank)
# --------------------------------------------------------------------------
@query(
    "q47_dedup_canonical_map",
    oracle="""
WITH fp AS (
  SELECT doc_id, n_chars,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT doc_id,
       fingerprint,
       first_value(doc_id) OVER (
         PARTITION BY fingerprint
         ORDER BY n_chars DESC, doc_id ASC) AS keep_id,
       CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size
FROM fp
""",
    tags=("pipeline", "dedup", "window"),
)
def q47_dedup_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized dedup *map*: every document annotated with
    its group's canonical representative (longest text wins, doc_id
    tiebreak) — the doc_id→keep_id mapping a pipeline joins against to
    filter a corpus while keeping provenance. Complements
    q16_dedup_exact: rank-based keep-best selection over a window
    rather than agg-min, and it returns the full mapping, not one row
    per group. One shuffle on the fingerprint; per-group state is a
    single running first_value/count — no arrays."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.encode(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                "UTF-8",
            )
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return fp.select(
        "doc_id",
        "fingerprint",
        F.first("doc_id").over(w).alias("keep_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("fingerprint"))
        .alias("group_size"),
    )


# --------------------------------------------------------------------------
# q64 — class-balanced group capping (deterministic downsampling)
# --------------------------------------------------------------------------
_CAP_PER_CLASS = 10


@query(
    "q64_class_balanced_cap",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
SELECT doc_id, lang, source, CAST(rnk AS INTEGER) AS rnk
FROM ranked
WHERE rnk <= {_CAP_PER_CLASS}
""",
    tags=("pipeline", "sampling", "balance"),
)
def q64_class_balanced_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every (lang, source) class at
    {_CAP_PER_CLASS} documents, chosen by md5-of-doc_id order — a
    deterministic uniform shuffle within each class, so over-represented
    classes are cut without any RNG state (the group-capping
    counterpart of q45's keep-fraction sampling; together they are the
    rebalancing pair every training-mix pipeline runs).

    Scale: one shuffle keyed by the class pair; WindowGroupLimit keeps
    {_CAP_PER_CLASS} rows per partition before it, so the exchange
    carries O(classes x cap), not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CAP_PER_CLASS)
    )


# --------------------------------------------------------------------------
# q79 — temperature-weighted source mixture (data-mixing rates)
# --------------------------------------------------------------------------
_MIX_SCALE = 1_000_000  # rates/shares on the 1e-6 grid


@query(
    "q79_source_mixture",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
wtd AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
  FROM per_src
),
tot AS (
  SELECT CAST(sum(w_sqrt) AS BIGINT) AS sum_w,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tok
  FROM wtd
)
SELECT w.source, w.n_docs, w.n_tokens, w.w_sqrt,
       CAST((w.w_sqrt * {_MIX_SCALE}) // t.sum_w AS BIGINT) AS share_q6,
       CAST(least({_MIX_SCALE},
            (CAST((w.w_sqrt * {_MIX_SCALE}) // t.sum_w AS HUGEINT)
             * (t.sum_tok // 2))
            // w.n_tokens) AS BIGINT) AS rate_q6,
       CAST((CAST(least({_MIX_SCALE},
            (CAST((w.w_sqrt * {_MIX_SCALE}) // t.sum_w AS HUGEINT)
             * (t.sum_tok // 2))
            // w.n_tokens) AS HUGEINT) * w.n_tokens) // {_MIX_SCALE} AS BIGINT)
         AS expect_tokens
FROM wtd w, tot t
""",
    tags=("pipeline", "sampling", "mixture"),
)
def q79_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (alpha = 0.5): each source's
    sampling weight is sqrt(its token count), normalized into a
    mixture share, then converted to a per-source sampling RATE that
    would fill a half-corpus token budget — the up/down-sampling table
    (multilingual / multi-domain mixing a la temperature sampling in
    mT5/XLM-R) a training pipeline derives before drawing data. sqrt
    on a BIGINT < 2^52 is correctly rounded IEEE in both engines, so
    floor(sqrt(n)) is exact; every later step is integer arithmetic
    on the 1e-6 grid. The share×token-budget and rate×n_tokens
    products are the r12 q98 overflow class — share_q6 ≤ 1e6 times a
    ~2e13-token 100 TB corpus crosses int64 at sum_tok ≈ 1.8e13 — so
    they are computed in DECIMAL(38,0) (DuckDB: HUGEINT) in lockstep;
    positives floor-divide identically, BIGINT outputs unchanged
    below 2^63 (r13 audit).

    Scale: one partial-then-final aggregate keyed by source collapses
    the corpus to #sources rows; the normalization total is a
    broadcast-sized single row cross-joined back. The emitted rate_q6
    feeds the deterministic hash sampler (q45) as its per-source
    threshold — together they make a full mixing pipeline with zero
    extra passes over the data."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
    )
    wtd = per_src.withColumn(
        "w_sqrt", F.expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)")
    )
    tot = wtd.agg(
        F.sum("w_sqrt").cast("long").alias("sum_w"),
        F.sum("n_tokens").cast("long").alias("sum_tok"),
    )
    share = F.expr(f"(w_sqrt * {_MIX_SCALE}) DIV sum_w")
    rate = F.expr(
        f"least(CAST({_MIX_SCALE} AS BIGINT), CAST("
        f"(CAST((w_sqrt * {_MIX_SCALE}) DIV sum_w AS DECIMAL(38,0))"
        f" * (sum_tok DIV 2)) DIV n_tokens AS BIGINT))"
    )
    return wtd.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "w_sqrt",
        share.cast("long").alias("share_q6"),
        rate.cast("long").alias("rate_q6"),
        F.expr(
            f"(CAST(least(CAST({_MIX_SCALE} AS BIGINT), CAST("
            f"(CAST((w_sqrt * {_MIX_SCALE}) DIV sum_w AS DECIMAL(38,0))"
            f" * (sum_tok DIV 2)) DIV n_tokens AS BIGINT))"
            f" AS DECIMAL(38,0)) * n_tokens) DIV {_MIX_SCALE}"
        )
        .cast("long")
        .alias("expect_tokens"),
    )


# --------------------------------------------------------------------------
# q84 — cross-source n-gram overlap matrix (corpus contamination audit)
# --------------------------------------------------------------------------
_XS_NGRAM = 3
_XS_KEY_HEX = 12  # 48-bit shingle key
_XS_SCALE = 1_000_000


@query(
    "q84_source_overlap_matrix",
    oracle=f"""
WITH t AS (
  SELECT source, {sql_tokens('text')} AS w FROM documents
  WHERE len({sql_tokens('text')}) >= {_XS_NGRAM}
),
sh AS (
  SELECT DISTINCT source,
         {sql_hex_prefix_int('md5(s)', _XS_KEY_HEX)} AS k
  FROM (SELECT source, unnest({sql_shingles('w', _XS_NGRAM)}) AS s FROM t)
),
per_src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM sh GROUP BY 1),
grouped AS (
  SELECT k, list(source ORDER BY source) AS srcs FROM sh GROUP BY 1
),
pairs AS (
  SELECT a.s AS src_a, b.s AS src_b
  FROM grouped, unnest(srcs) AS a(s), unnest(srcs) AS b(s)
  WHERE a.s < b.s
),
shared AS (
  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_grams
  FROM pairs GROUP BY 1, 2
)
SELECT s.src_a, s.src_b, s.shared_grams,
       pa.n_grams AS n_grams_a,
       pb.n_grams AS n_grams_b,
       CAST((s.shared_grams * {_XS_SCALE})
            // (pa.n_grams + pb.n_grams - s.shared_grams) AS BIGINT) AS jaccard_q6
FROM shared s
JOIN per_src pa ON pa.source = s.src_a
JOIN per_src pb ON pb.source = s.src_b
""",
    tags=("pipeline", "audit", "overlap"),
)
def q84_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram contamination matrix between corpus sources:
    for every source pair, how many distinct token {_XS_NGRAM}-grams
    they share and the Jaccard overlap of their gram sets — the audit
    that finds mirrored / scraped-twice subcorpora before dedup rates
    and mixing weights (q79) are trusted.

    Scale: grams collapse to distinct (source, 48-bit key) rows first
    (one fine-grained shuffle); each gram's source list is bounded by
    |sources| (not corpus size), so the in-group pair expansion is at
    most |sources|² per gram — the same bounded-bucket trick as q17 —
    and the final matrix is |sources|² rows. No self-join re-executes
    the shingle subtree; the Jaccard denominator comes from a tiny
    per-source aggregate joined twice."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", tokens("text").alias("w")).filter(
        F.size("w") >= _XS_NGRAM
    )
    sh = (
        t.select("source", F.explode(shingles("w", _XS_NGRAM)).alias("s"))
        .select(
            "source",
            hex_prefix_int(F.md5(F.encode(F.col("s"), "UTF-8")), _XS_KEY_HEX).alias(
                "k"
            ),
        )
        .distinct()
    )
    # r15: per-source gram counts AND shared-pair counts both come
    # from ONE pass over the gram groups — before, the distinct
    # (source, k) frame was referenced twice, so the shingle explode
    # and its distinct shuffle executed twice. Each gram group emits
    # its singles (src_b NULL = per-source tally; exploding the
    # collect_set reproduces sh exactly) alongside its pairs, one
    # bounded-fanout aggregate sorts them out, and the |sources|²-row
    # result persists for its two tiny filter readers.
    grouped = sh.groupBy("k").agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    both_expr = (
        "concat("
        "transform(srcs, a -> struct(a AS src_a, CAST(NULL AS STRING) AS src_b)), "
        "filter(flatten(transform(srcs, a -> transform(srcs, b -> "
        "struct(a AS src_a, b AS src_b)))), p -> p.src_a < p.src_b))"
    )
    counts = (
        grouped.select(F.explode(F.expr(both_expr)).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(persist_tracked)
    )
    per_src = counts.filter(F.col("src_b").isNull()).select(
        F.col("src_a").alias("source"), F.col("cnt").alias("n_grams")
    )
    shared = counts.filter(F.col("src_b").isNotNull()).select(
        "src_a", "src_b", F.col("cnt").alias("shared_grams")
    )
    pa = per_src.select(
        F.col("source").alias("src_a"), F.col("n_grams").alias("n_grams_a")
    )
    pb = per_src.select(
        F.col("source").alias("src_b"), F.col("n_grams").alias("n_grams_b")
    )
    return (
        shared.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_grams",
            "n_grams_a",
            "n_grams_b",
            F.expr(
                f"(shared_grams * {_XS_SCALE}) "
                f"DIV (n_grams_a + n_grams_b - shared_grams)"
            )
            .cast("long")
            .alias("jaccard_q6"),
        )
    )


# --------------------------------------------------------------------------
# q89 — Z-order clustering vs insertion-order layout (zone-map skipping)
# --------------------------------------------------------------------------
_Z_BITS = 12  # 12 bits/dim -> 24-bit Morton key; wider SFs fold mod 4096
_Z_EPOCH_H = 473352  # hours at 2024-01-01 00:00 UTC (events' epoch)
_Z_H_LO, _Z_H_HI = 120, 167  # probe box: days 6-7 of the 30-day stream
_Z_NAT_ROWS = 512  # rows per "file" in insertion order
_Z_CELL = 1024  # z-values per z-cell "file" (drops 5 low bits per dim)


def _morton_expr(hx: str, hy: str, div: str) -> str:
    """Bit-interleave via pure integer div/mod — the only bit machinery
    both engines evaluate identically (``div``: Spark ``DIV``, DuckDB
    ``//``). Generated sum of 2*_Z_BITS terms, constant-folded by both
    optimizers."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({hx} {div} {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"(({hy} {div} {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


@query(
    "q89_zorder_layout",
    oracle=f"""
WITH b AS (SELECT CAST(max(user_id) // 10 AS BIGINT) AS u_hi FROM events),
ev AS (SELECT event_id, user_id,
              epoch_us(ts) // 3600000000 - {_Z_EPOCH_H} AS h
       FROM events),
z AS (SELECT ev.*, b.u_hi,
             {_morton_expr("(user_id % 4096)", "(h % 4096)", "//")} AS zkey
      FROM ev, b),
uni AS (
  SELECT 'natural' AS layout, event_id // {_Z_NAT_ROWS} AS file_id,
         user_id, h, u_hi FROM z
  UNION ALL
  SELECT 'zorder', zkey // {_Z_CELL}, user_id, h, u_hi FROM z),
f AS (SELECT layout, file_id,
        min(user_id) umin, max(user_id) umax, min(h) hmin, max(h) hmax,
        count(*) n_rows,
        sum(CASE WHEN user_id <= u_hi AND h BETWEEN {_Z_H_LO} AND {_Z_H_HI}
            THEN 1 ELSE 0 END) m,
        max(u_hi) u_hi
      FROM uni GROUP BY 1, 2)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN umin <= u_hi AND umax >= 0
                 AND hmin <= {_Z_H_HI} AND hmax >= {_Z_H_LO}
                 THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN umin <= u_hi AND umax >= 0
                 AND hmin <= {_Z_H_HI} AND hmax >= {_Z_H_LO}
                 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(m) AS BIGINT) AS rows_matched,
       CAST(sum(CASE WHEN umin <= u_hi AND umax >= 0
                 AND hmin <= {_Z_H_HI} AND hmax >= {_Z_H_LO}
                 THEN n_rows ELSE 0 END) * 10000 // sum(n_rows)
            AS BIGINT) AS scan_pct_q4
FROM f GROUP BY 1
""",
    tags=("layout", "zorder", "pruning"),
)
def q89_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout advisor: how many file scans a 2-D range probe
    (a user band x a 2-day window) needs under the write-time layout
    vs a Z-order clustering — the decision behind Delta/Iceberg
    ``OPTIMIZE ZORDER BY (user_id, hour)``. Each layout maps every
    event to a "file" (insertion order: {_Z_NAT_ROWS}-row batches;
    Z-order: Morton-key cells covering a 32x32 (user, hour) box),
    builds per-file min/max zone maps, and counts the files/rows a
    zone-map-pruned scan must touch. At sf0.01 the natural layout
    reads 10.2% of rows for a 0.58% selection; Z-order reads 2.8%.

    Scale (100 TB): the Morton key is pure integer div/mod arithmetic
    in whole-stage codegen; both layout assignments are map-only (the
    z-cell id IS the file id — no global sort, unlike row_number
    clustering), the zone-map census is one partial-agg shuffle keyed
    by (layout, file), and the verdict aggregate runs over file-count
    rows, i.e. metadata scale. The probe bound rides in a 1-row
    broadcast. A real lakehouse OPTIMIZE would range-partition by the
    same key; using fixed z-cells instead keeps the operator
    shuffle-light and the file boundaries deterministic.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(f"unix_micros(ts) DIV 3600000000 - {_Z_EPOCH_H}").alias("h"),
    )
    uhi = ev.agg((F.max("user_id") / 10).cast("long").alias("u_hi"))
    base = ev.crossJoin(F.broadcast(uhi)).withColumn(
        "zkey", F.expr(_morton_expr("(user_id % 4096)", "(h % 4096)", "DIV"))
    )
    nat = base.select(
        F.lit("natural").alias("layout"),
        F.expr(f"event_id DIV {_Z_NAT_ROWS}").alias("file_id"),
        "user_id",
        "h",
        "u_hi",
    )
    zor = base.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"zkey DIV {_Z_CELL}").alias("file_id"),
        "user_id",
        "h",
        "u_hi",
    )
    files = (
        nat.union(zor)
        .withColumn(
            "m",
            F.expr(
                f"CAST(user_id <= u_hi AND h BETWEEN {_Z_H_LO} AND {_Z_H_HI} AS BIGINT)"
            ),
        )
        .groupBy("layout", "file_id")
        .agg(
            F.min("user_id").alias("umin"),
            F.max("user_id").alias("umax"),
            F.min("h").alias("hmin"),
            F.max("h").alias("hmax"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("m").alias("m"),
            F.max("u_hi").alias("u_hi"),
        )
    )
    return (
        files.withColumn(
            "scan",
            F.expr(
                f"CAST(umin <= u_hi AND umax >= 0 "
                f"AND hmin <= {_Z_H_HI} AND hmax >= {_Z_H_LO} AS BIGINT)"
            ),
        )
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum("scan").cast("long").alias("files_scanned"),
            F.sum(F.expr("n_rows * scan")).cast("long").alias("rows_scanned"),
            F.sum("m").cast("long").alias("rows_matched"),
        )
        .withColumn(
            "scan_pct_q4",
            F.expr("CAST(rows_scanned * 10000 DIV rows_total AS BIGINT)"),
        )
    )


# --------------------------------------------------------------------------
# q97 — resharding-cost advisor: mod-hash vs rendezvous (HRW) hashing
# --------------------------------------------------------------------------
_RS_N = 16  # current shard count; the advisor evaluates adding one


def _hrw_hashes(n: int) -> list[str]:
    """Engine-agnostic md5 scores of doc_id against each shard id
    (equal-width lowercase hex compares lexicographically in both
    engines, standing in for the numeric HRW score)."""
    return [f"md5(CAST(doc_id AS STRING) || ':' || '{s}')" for s in range(n)]


@query(
    "q97_reshard_advisor",
    oracle=f"""
WITH a AS (
  SELECT doc_id,
         list_position([{", ".join(_hrw_hashes(_RS_N))}],
             list_max([{", ".join(_hrw_hashes(_RS_N))}])) - 1 AS h_old,
         list_position([{", ".join(_hrw_hashes(_RS_N + 1))}],
             list_max([{", ".join(_hrw_hashes(_RS_N + 1))}])) - 1 AS h_new,
         doc_id % {_RS_N} AS m_old,
         doc_id % {_RS_N + 1} AS m_new
  FROM documents
),
uni AS (
  SELECT 'mod' AS strategy, m_new AS shard,
         CASE WHEN m_old <> m_new THEN 1 ELSE 0 END AS moved FROM a
  UNION ALL
  SELECT 'rendezvous', h_new, CASE WHEN h_old <> h_new THEN 1 ELSE 0 END FROM a
),
per_shard AS (
  SELECT strategy, shard, count(*) AS load, sum(moved) AS moved
  FROM uni GROUP BY 1, 2
)
SELECT strategy,
       CAST(sum(load) AS BIGINT) AS n_docs,
       CAST(sum(moved) AS BIGINT) AS n_moved,
       CAST(sum(moved) * 10000 // sum(load) AS BIGINT) AS moved_pct_q4,
       CAST(max(load) AS BIGINT) AS max_shard_load,
       CAST(min(load) AS BIGINT) AS min_shard_load
FROM per_shard GROUP BY 1
""",
    tags=("layout", "sharding", "advisor"),
)
def q97_reshard_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-cost advisor: when a {_RS_N}-shard corpus grows a
    shard, how many documents move under naive mod-hashing versus
    rendezvous (highest-random-weight) hashing, and how balanced is
    the new assignment? Mod-hash remaps ~N/(N+1) of all keys (a full
    rewrite at 100 TB); rendezvous moves ~1/(N+1) — the measurement
    behind choosing stable sharding for an append-only corpus store
    (and exactly the property consistent-hash rings buy).

    Scale: the HRW argmax is {_RS_N + 1} md5s + an array max per row,
    all codegen (no UDFs, no shuffle); the verdict is a two-level
    aggregate — per-(strategy, shard) loads (≤ 2·(N+1) groups after
    map-side partials) rolled up to one row per strategy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    arr_old = "array(" + ", ".join(_hrw_hashes(_RS_N)) + ")"
    arr_new = "array(" + ", ".join(_hrw_hashes(_RS_N + 1)) + ")"
    a = docs.select(
        "doc_id",
        (F.expr(f"array_position({arr_old}, array_max({arr_old}))") - 1).alias(
            "h_old"
        ),
        (F.expr(f"array_position({arr_new}, array_max({arr_new}))") - 1).alias(
            "h_new"
        ),
        (F.col("doc_id") % _RS_N).alias("m_old"),
        (F.col("doc_id") % (_RS_N + 1)).alias("m_new"),
    )
    mod = a.select(
        F.lit("mod").alias("strategy"),
        F.col("m_new").alias("shard"),
        (F.col("m_old") != F.col("m_new")).cast("long").alias("moved"),
    )
    hrw = a.select(
        F.lit("rendezvous").alias("strategy"),
        F.col("h_new").alias("shard"),
        (F.col("h_old") != F.col("h_new")).cast("long").alias("moved"),
    )
    per_shard = (
        mod.unionByName(hrw)
        .groupBy("strategy", "shard")
        .agg(F.count(F.lit(1)).alias("load"), F.sum("moved").alias("moved"))
    )
    return per_shard.groupBy("strategy").agg(
        F.sum("load").cast("long").alias("n_docs"),
        F.sum("moved").cast("long").alias("n_moved"),
        F.expr("CAST(sum(moved) * 10000 DIV sum(load) AS BIGINT)").alias(
            "moved_pct_q4"
        ),
        F.max("load").cast("long").alias("max_shard_load"),
        F.min("load").cast("long").alias("min_shard_load"),
    )


# --------------------------------------------------------------------------
# q102 — clean-corpus materialization report (filter ∘ dedup composition)
# --------------------------------------------------------------------------
# Reuses q52's Gopher-rule constants and q16's canonical-copy rule so
# the composed pipeline stays consistent with its component operators.
from .text import _QF_MAX_MEAN_LEN  # noqa: E402
from .text import _QF_MAX_TOK  # noqa: E402
from .text import _QF_MIN_MEAN_LEN  # noqa: E402
from .text import _QF_MIN_STOP  # noqa: E402
from .text import _QF_MIN_TOK  # noqa: E402
from .text import _STOP_SQL  # noqa: E402


@query(
    "q102_clean_corpus_report",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang, text,
         CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform({sql_tokens('text')}, t -> length(t)))
              AS BIGINT) AS sum_len,
         CAST(len(list_filter({sql_tokens('text')}, t -> t IN ({_STOP_SQL})))
              AS BIGINT) AS n_stop
  FROM documents
),
flags AS (
  SELECT doc_id, lang, text, n_tok,
         ((n_tok BETWEEN {_QF_MIN_TOK} AND {_QF_MAX_TOK})
          AND (CAST(sum_len AS DOUBLE) / n_tok
               BETWEEN {_QF_MIN_MEAN_LEN} AND {_QF_MAX_MEAN_LEN})
          AND (CAST(n_stop AS DOUBLE) / n_tok >= {_QF_MIN_STOP})) AS keep_q
  FROM m
),
canon AS (SELECT md5(text) AS fp, min(doc_id) AS keep_id FROM documents GROUP BY 1),
labeled AS (
  SELECT f.doc_id, f.lang, f.n_tok, f.keep_q,
         (f.doc_id = c.keep_id) AS is_canon
  FROM flags f JOIN canon c ON md5(f.text) = c.fp
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN keep_q AND is_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(sum(CASE WHEN keep_q AND is_canon THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_clean,
       CAST(sum(CASE WHEN keep_q AND is_canon THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS retained_pct_q4
FROM labeled GROUP BY 1
""",
    tags=("pipeline", "composition", "report"),
)
def q102_clean_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation report: compose the Gopher quality
    filter (q52's rules) with canonical exact dedup (q16's min-doc_id
    rule) and report, per language, how much survives — raw docs,
    quality-passing docs, clean (quality AND canonical) docs, clean
    token count, and the retention rate. This is the summary table a
    data-curation run publishes after every ingest.

    Scale: the quality flags are per-row array arithmetic (map-only);
    dedup is one fingerprint-keyed hash aggregate + a fingerprint
    join back (q16's shape); the report aggregate has language
    cardinality. Composing the operators adds NO new shuffle class —
    exactly why the pipeline stays one job at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    w = "split(lower(trim(text)), '\\\\s+')"
    m = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        F.expr(
            f"CAST(aggregate(transform({w}, t -> length(t)), "
            "CAST(0 AS BIGINT), (a, b) -> a + b) AS BIGINT)"
        ).alias("sum_len"),
        F.expr(
            f"CAST(size(filter({w}, t -> t IN ({_STOP_SQL}))) AS BIGINT)"
        ).alias("n_stop"),
    )
    keep_q = (
        F.col("n_tok").between(_QF_MIN_TOK, _QF_MAX_TOK)
        & (F.col("sum_len").cast("double") / F.col("n_tok")).between(
            _QF_MIN_MEAN_LEN, _QF_MAX_MEAN_LEN
        )
        & (F.col("n_stop").cast("double") / F.col("n_tok") >= _QF_MIN_STOP)
    )
    flags = m.select(
        "doc_id",
        "lang",
        "n_tok",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp"),
        keep_q.alias("keep_q"),
    )
    canon = (
        docs.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"))
    )
    labeled = flags.join(canon, "fp").withColumn(
        "is_canon", F.col("doc_id") == F.col("keep_id")
    )
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.col("keep_q").cast("long")).cast("long").alias("n_quality"),
        F.sum((F.col("keep_q") & F.col("is_canon")).cast("long"))
        .cast("long")
        .alias("n_clean"),
        F.sum(
            F.when(F.col("keep_q") & F.col("is_canon"), F.col("n_tok")).otherwise(0)
        )
        .cast("long")
        .alias("tokens_clean"),
        F.expr(
            "CAST(sum(CAST(keep_q AND is_canon AS BIGINT)) * 10000 DIV count(*) AS BIGINT)"
        ).alias("retained_pct_q4"),
    )


# --------------------------------------------------------------------------
# q103 — mixture rebalancer: materialize q79's rates with q45's sampler
# --------------------------------------------------------------------------
@query(
    "q103_mixture_rebalance",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
wtd AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
  FROM per_src
),
tot AS (
  SELECT CAST(sum(w_sqrt) AS BIGINT) AS sum_w,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tok
  FROM wtd
),
rates AS (
  SELECT w.source, w.n_docs, w.n_tokens,
         CAST(least({_MIX_SCALE},
              ((w.w_sqrt * {_MIX_SCALE}) // t.sum_w * (t.sum_tok // 2))
              // w.n_tokens) AS BIGINT) AS rate_q6
  FROM wtd w, tot t
),
flagged AS (
  SELECT d.source,
         len({sql_tokens('d.text')}) AS n_tok,
         CASE WHEN {sql_hex_prefix_int("md5(CAST(d.doc_id AS STRING))", 8)}
                   % {_MIX_SCALE} < r.rate_q6
              THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN rates r ON d.source = r.source
)
SELECT r.source, r.n_docs, r.n_tokens, r.rate_q6,
       CAST(sum(f.kept) AS BIGINT) AS kept_docs,
       CAST(sum(f.kept * f.n_tok) AS BIGINT) AS kept_tokens,
       CAST(sum(f.kept) * {_MIX_SCALE} // r.n_docs AS BIGINT) AS achieved_rate_q6
FROM flagged f JOIN rates r ON f.source = r.source
GROUP BY 1, 2, 3, 4
""",
    tags=("pipeline", "sampling", "composition"),
)
def q103_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the training mixture: q79 decides each source's
    temperature-weighted sampling rate; this operator APPLIES it with
    q45's deterministic hash sampler (keep iff md5(doc_id) mod 1e6 <
    rate) and reports target vs achieved per source — the reconciler
    a data-mixing pipeline runs to prove the materialized corpus
    matches the recipe.

    Scale: the rate table is source-cardinality and broadcast; the
    keep decision is a per-row hash compare (zero shuffle on the
    corpus scan); the report is one source-keyed partial aggregate.
    Sampling is per-key deterministic, so reruns and engines agree
    bit-for-bit — no RNG state anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    rates = q79_source_mixture(spark, sf_dir).select(
        "source", "n_docs", "n_tokens", "rate_q6"
    )
    bucket = (
        hex_prefix_int(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 8)
        % _MIX_SCALE
    )
    flagged = (
        docs.select(
            "source",
            F.size(tokens("text")).cast("long").alias("n_tok"),
            bucket.alias("bkt"),
        )
        .join(F.broadcast(rates), "source")
        .withColumn("kept", (F.col("bkt") < F.col("rate_q6")).cast("long"))
    )
    return flagged.groupBy("source", "n_docs", "n_tokens", "rate_q6").agg(
        F.sum("kept").cast("long").alias("kept_docs"),
        F.sum(F.expr("kept * n_tok")).cast("long").alias("kept_tokens"),
        F.expr(f"CAST(sum(kept) * {_MIX_SCALE} DIV n_docs AS BIGINT)").alias(
            "achieved_rate_q6"
        ),
    )


# --------------------------------------------------------------------------
# q114 — overlapping context windows (RAG / training chunking)
# --------------------------------------------------------------------------
_CW_LEN = 64  # tokens per context window
_CW_STRIDE = 32  # 50% overlap


@query(
    "q114_context_windows",
    oracle=f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS w FROM documents),
n AS (
  SELECT doc_id, w, len(w) AS n_tok,
         (greatest(len(w) - {_CW_LEN}, 0) + {_CW_STRIDE - 1}) // {_CW_STRIDE} + 1
           AS n_win
  FROM t
),
win AS (
  SELECT doc_id, n_tok, CAST(i AS BIGINT) AS win_idx,
         least({_CW_LEN}, n_tok - i * {_CW_STRIDE}) AS win_len,
         md5(array_to_string(
             list_slice(w, i * {_CW_STRIDE} + 1, i * {_CW_STRIDE} + {_CW_LEN}),
             ' ')) AS win_md5
  FROM n, unnest(range(0, n_win)) AS u(i)
)
SELECT doc_id, win_idx,
       CAST(win_len AS BIGINT) AS win_len,
       win_md5
FROM win
""",
    tags=("pipeline", "chunking", "rag"),
)
def q114_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: every document becomes
    ceil((n−{_CW_LEN})/{_CW_STRIDE})+1 windows of {_CW_LEN} tokens
    with 50% overlap — the standard RAG-indexing / long-doc training
    prep (sliding windows so no span is ever split across a boundary
    without also appearing whole). Each window carries its md5 so a
    downstream embed-and-index stage can dedup identical windows
    (q88's census applies unchanged).

    Scale: window construction is per-row array arithmetic in codegen
    (transform + slice over the token array, then one explode) —
    map-only, no Python, no shuffle; output cardinality is
    ~n_tokens/{_CW_STRIDE} rows, the same class as a tokenizer
    explode."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("w"))
    n = t.select(
        "doc_id",
        "w",
        F.size("w").alias("n_tok"),
        F.expr(
            f"CAST((greatest(size(w) - {_CW_LEN}, 0) + {_CW_STRIDE - 1}) "
            f"/ {_CW_STRIDE} AS INT) + 1"
        ).alias("n_win"),
    )
    wins = n.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.expr(
                f"transform(sequence(0, n_win - 1), i -> struct("
                f"CAST(i AS BIGINT) AS win_idx, "
                f"least({_CW_LEN}, n_tok - i * {_CW_STRIDE}) AS win_len, "
                f"md5(encode(concat_ws(' ', slice(w, i * {_CW_STRIDE} + 1, {_CW_LEN})), 'UTF-8')) AS win_md5))"
            )
        ).alias("s"),
    )
    return wins.select(
        "doc_id",
        F.col("s.win_idx").alias("win_idx"),
        F.col("s.win_len").cast("long").alias("win_len"),
        F.col("s.win_md5").alias("win_md5"),
    )

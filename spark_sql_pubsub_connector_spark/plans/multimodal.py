"""Multimodal-column operators (SURVEY.md §2.3).

Images/audio/video are modeled the way the reference models Pub/Sub
payloads — an opaque ``binary`` column plus typed metadata (the read
schema's ``data BinaryType`` + ``attributes MapType``, reference
``package.scala:174-186``) — and processed with Arrow-batched
``mapInPandas`` UDFs, the idiomatic Spark shape for per-blob Python
work at scale:

  q27  decode + content hash     — bytes → (length, md5) features
  q28  image header parse        — stubbed decoder behind a format gate
  q29  frame sampling            — 1 blob → N sampled-frame rows

The container has no image/audio libraries, so the *decode* step is a
deterministic fake behind a clearly-marked ``NotImplementedError``
gate (q28 ``_decode_image``); everything Spark-side — binary schema,
metadata map, Arrow batch shape, per-partition batching, 1→N row
expansion — is real and oracle-checked.

Scale design: mapInPandas streams Arrow record batches through one
Python worker per core with no shuffle; blobs never leave their input
partition. Feature extraction is the only Python in this repo's hot
path, and it is vectorized per batch (hashlib over ndarray of bytes),
never per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .tables import load_table

_FRAME_STRIDE = 4


# --------------------------------------------------------------------------
# q27 — binary decode + content-hash feature extraction
# --------------------------------------------------------------------------
def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: payload bytes → (byte_len,
    content_md5). Deterministic, pure-Python, no external codecs.

    Null payloads (a null source column upstream) follow SQL
    semantics — null in, null features out, row preserved — matching
    ``length(NULL)``/``md5(NULL)`` on the oracle side. Null-carrying
    numeric outputs use pandas nullable ``Int64`` (None → pd.NA →
    Arrow null), which keeps the Arrow conversion on the vectorized
    path instead of per-element object boxing (measured ~8× per
    column); non-null output bytes are unchanged."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pd.Series(
                    [len(b) if b is not None else None for b in payloads],
                    dtype="Int64",
                    index=payloads.index,
                ),
                "content_md5": payloads.map(
                    lambda b: None
                    if b is None
                    else hashlib.md5(bytes(b)).hexdigest()
                ),
                "source": pdf["src"],
            }
        )


@query(
    "q27_mm_decode_meta",
    oracle="""
SELECT doc_id,
       length(text) AS byte_len,
       md5(text)    AS content_md5,
       source
FROM documents
""",
    tags=("multimodal", "mapInPandas"),
)
def q27_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing end-to-end: build an opaque payload +
    metadata map (the connector's message shape), ship it through an
    Arrow-batched mapInPandas feature extractor, return typed scalars.
    The oracle recomputes the same features relationally (text is
    ASCII, so VARCHAR md5 == bytes md5)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("source").alias("src"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )
    return blobs.mapInPandas(
        _decode_features,
        schema="doc_id long, byte_len long, content_md5 string, source string",
    )


# --------------------------------------------------------------------------
# q28 — image metadata extraction (stubbed decoder)
# --------------------------------------------------------------------------
def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """Parse the 12-byte FAKE header → (width, height, body_len).

    Real image decoding (JPEG/PNG) would dispatch here on the magic
    bytes; the codec libraries are not in this container, so any
    non-FAKE payload raises — the Spark-side plumbing is what's under
    test (SURVEY.md §2.3 'stub the decode step').
    """
    magic = payload[:4]
    if magic != b"FAKE":
        raise NotImplementedError(
            f"no codec for magic {magic!r}; only the FAKE test format is bundled"
        )
    width = int(payload[4:8])
    height = int(payload[8:12])
    return width, height, len(payload) - 12


def _extract_image_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Null payloads (null text upstream nulls the whole concat) decode
    # to all-null metadata, SQL-style; non-null rows are unchanged.
    for pdf in batches:
        decoded = [
            _decode_image(bytes(b)) if b is not None else (None, None, None)
            for b in pdf["payload"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series([d[0] for d in decoded], dtype="Int64"),
                "height": pd.Series([d[1] for d in decoded], dtype="Int64"),
                "body_len": pd.Series([d[2] for d in decoded], dtype="Int64"),
            }
        )


@query(
    "q28_mm_image_meta",
    oracle="""
SELECT doc_id,
       64 + (doc_id % 8) * 32 AS width,
       64 + (doc_id % 5) * 48 AS height,
       length(text) AS body_len
FROM documents
""",
    tags=("multimodal", "stub"),
)
def q28_mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize FAKE-format image blobs (4-byte magic + 4+4 digit
    dims + body), then recover the dimensions with the stubbed decoder
    through mapInPandas. Proves the binary round-trip: Spark builds
    bytes → Arrow ships them → Python parses them — the exact dataflow
    a real JPEG metadata extractor would use."""
    docs = load_table(spark, sf_dir, "documents")
    width = 64 + (F.col("doc_id") % 8) * 32
    height = 64 + (F.col("doc_id") % 5) * 48
    header = F.concat(
        F.lit("FAKE"),
        F.lpad(width.cast("string"), 4, "0"),
        F.lpad(height.cast("string"), 4, "0"),
        F.col("text"),
    )
    blobs = docs.select("doc_id", F.encode(header, "UTF-8").alias("payload"))
    return blobs.mapInPandas(
        _extract_image_meta,
        schema="doc_id long, width long, height long, body_len long",
    )


# --------------------------------------------------------------------------
# q29 — video frame sampling (1 blob → N rows)
# --------------------------------------------------------------------------
def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Emit every ``_FRAME_STRIDE``-th frame index with a deterministic
    frame signature — the row-expansion shape of real frame extraction
    (1 video in, N frame rows out), minus the codec."""
    for pdf in batches:
        ids, idxs, sigs = [], [], []
        for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
            for fi in range(0, int(n_frames), _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(fi)
                sigs.append(hashlib.md5(f"{doc_id}:{fi}".encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_md5": pd.Series(sigs, dtype="object"),
            }
        )


@query(
    "q29_mm_frame_sample",
    oracle=f"""
WITH v AS (SELECT doc_id, 10 + doc_id % 20 AS n_frames FROM documents)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)) AS frame_md5
FROM v, unnest(range(0, n_frames, {_FRAME_STRIDE})) AS t(f)
""",
    tags=("multimodal", "frames"),
)
def q29_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each 'video' (frame count derived from doc_id)
    expands to ceil(n/stride) frame rows inside mapInPandas. Output
    cardinality grows in the Python stage — exactly how mapInPandas
    differs from a scalar pandas_udf — while staying partition-local
    (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    videos = docs.select(
        "doc_id", (F.lit(10) + F.col("doc_id") % 20).alias("n_frames")
    )
    return videos.mapInPandas(
        _sample_frames, schema="doc_id long, frame_idx long, frame_md5 string"
    )


# --------------------------------------------------------------------------
# q62 — image resize plumbing (aspect-fit thumbnail)
# --------------------------------------------------------------------------
_THUMB = 64  # fit the longer side to 64px


def _resize_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-preserving 'resize': parse the FAKE header, compute the
    thumbnail dims with exact integer math, and emit a re-encoded FAKE
    payload whose body is a deterministic signature of (body, dims) —
    the byte-level dataflow of a real thumbnailer (decode → scale →
    re-encode) with the pixel codec stubbed out (SURVEY.md §2.3)."""
    for pdf in batches:
        ids, ows, ohs, sigs = [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            ids.append(doc_id)
            if b is None:  # SQL semantics: null blob → null thumbnail
                ows.append(None)
                ohs.append(None)
                sigs.append(None)
                continue
            payload = bytes(b)
            w, h, _ = _decode_image(payload)
            body = payload[12:]
            m = max(w, h)
            ow, oh = (w * _THUMB) // m, (h * _THUMB) // m
            body_sig = hashlib.md5(body + f"{ow}x{oh}".encode()).hexdigest()
            resized = b"FAKE" + f"{ow:04d}{oh:04d}".encode() + body_sig.encode()
            ows.append(ow)
            ohs.append(oh)
            sigs.append(hashlib.md5(resized).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_w": pd.Series(ows, dtype="Int64"),
                "out_h": pd.Series(ohs, dtype="Int64"),
                "resized_md5": pd.Series(sigs, dtype="object"),
            }
        )


@query(
    "q62_mm_resize",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, text,
         64 + (doc_id % 8) * 32 AS w,
         64 + (doc_id % 5) * 48 AS h
  FROM documents
),
o AS (
  SELECT doc_id, text,
         (w * {_THUMB}) // greatest(w, h) AS ow,
         (h * {_THUMB}) // greatest(w, h) AS oh
  FROM dims
)
SELECT doc_id,
       CAST(ow AS BIGINT) AS out_w,
       CAST(oh AS BIGINT) AS out_h,
       md5('FAKE' || lpad(CAST(ow AS VARCHAR), 4, '0')
                  || lpad(CAST(oh AS VARCHAR), 4, '0')
                  || md5(text || CAST(ow AS VARCHAR) || 'x'
                              || CAST(oh AS VARCHAR))) AS resized_md5
FROM o
""",
    tags=("multimodal", "resize"),
)
def q62_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail plumbing — the missing quartet member next to
    decode (q27), metadata extraction (q28), and frame sampling (q29):
    blobs go bytes-in → transformed-bytes-out through mapInPandas,
    with new dimensions and a content hash of the re-encoded payload
    surfaced as typed columns. Partition-local, no shuffle; at 100 TB
    this is the standard shape for bulk image preprocessing (one
    Arrow-batched Python stage per scan partition)."""
    docs = load_table(spark, sf_dir, "documents")
    width = 64 + (F.col("doc_id") % 8) * 32
    height = 64 + (F.col("doc_id") % 5) * 48
    header = F.concat(
        F.lit("FAKE"),
        F.lpad(width.cast("string"), 4, "0"),
        F.lpad(height.cast("string"), 4, "0"),
        F.col("text"),
    )
    blobs = docs.select("doc_id", F.encode(header, "UTF-8").alias("payload"))
    return blobs.mapInPandas(
        _resize_image,
        schema="doc_id long, out_w long, out_h long, resized_md5 string",
    )


# --------------------------------------------------------------------------
# q96 — audio feature extraction (stubbed codec, vectorized DSP shape)
# --------------------------------------------------------------------------
def _decode_audio(payload: bytes) -> tuple[int, bytes]:
    """Parse the FAKA header → (sample_rate, pcm_body). A real decoder
    (wav/mp3/flac) would dispatch on the magic bytes; the codec
    libraries are not in this container, so any non-FAKA payload
    raises (SURVEY.md §2.3 'stub the decode step')."""
    if payload[:4] != b"FAKA":
        raise NotImplementedError(
            f"no codec for magic {payload[:4]!r}; only the FAKA test format is bundled"
        )
    return int(payload[4:10]), payload[10:]


def _extract_audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Loudness/duration features over uint8 'PCM': everything is
    numpy-vectorized per blob (sum/max/dot on the sample array) — the
    Arrow-batched shape a real loudness meter (e.g. ITU BS.1770
    blocks) would use, minus the codec."""
    import numpy as np

    for pdf in batches:
        ids, ns, durs, peaks, means, energies = [], [], [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            ids.append(doc_id)
            if b is None:  # SQL semantics: null blob → null features
                for col in (ns, durs, peaks, means, energies):
                    col.append(None)
                continue
            sr, body = _decode_audio(bytes(b))
            pcm = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
            n = int(pcm.size)
            if n == 0:  # empty body: count 0, empty-set aggregates null
                ns.append(0)
                durs.append(0)
                for col in (peaks, means, energies):
                    col.append(None)
                continue
            ns.append(n)
            durs.append(n * 1000 // sr)
            peaks.append(int(pcm.max()))
            means.append(int(pcm.sum()) * 10_000 // n)
            energies.append(int(pcm @ pcm) * 10_000 // n)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="Int64"),
                "duration_ms": pd.Series(durs, dtype="Int64"),
                "peak": pd.Series(peaks, dtype="Int64"),
                "mean_q4": pd.Series(means, dtype="Int64"),
                "energy_q4": pd.Series(energies, dtype="Int64"),
            }
        )


@query(
    "q96_mm_audio_features",
    oracle="""
WITH s AS (
  SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS sr, text FROM documents
),
pcm AS (
  SELECT doc_id, sr, length(text) AS n,
         sum(ord(substr(text, i, 1))) AS tot,
         max(ord(substr(text, i, 1))) AS peak,
         sum(ord(substr(text, i, 1)) * ord(substr(text, i, 1))) AS totsq
  FROM s, unnest(range(1, length(text) + 1)) AS t(i)
  GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // sr AS BIGINT) AS duration_ms,
       CAST(peak AS BIGINT) AS peak,
       CAST(tot * 10000 // n AS BIGINT) AS mean_q4,
       CAST(totsq * 10000 // n AS BIGINT) AS energy_q4
FROM pcm
""",
    tags=("multimodal", "audio", "mapInPandas"),
)
def q96_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing end-to-end: synthesize FAKA-format blobs (magic
    + 6-digit sample rate + uint8 'PCM' body — the doc text bytes),
    ship them through Arrow, and extract duration/peak/mean/energy
    with numpy-vectorized math in mapInPandas. The oracle recomputes
    the identical integer features relationally from the char codes.

    Scale: partition-local like all multimodal ops (blobs never
    shuffle); per-blob work is O(samples) vectorized numpy — the same
    dataflow a real loudness/VAD feature pass runs at corpus scale.
    Mean and energy live on the 1e-4 integer grid (sums and dot
    products are exact int64), so no float crosses the engine
    boundary."""
    docs = load_table(spark, sf_dir, "documents")
    sr = F.lit(8000) + (F.col("doc_id") % 4) * 4000
    payload = F.concat(
        F.lit("FAKA"), F.lpad(sr.cast("string"), 6, "0"), F.col("text")
    )
    blobs = docs.select("doc_id", F.encode(payload, "UTF-8").alias("payload"))
    return blobs.mapInPandas(
        _extract_audio_features,
        schema=(
            "doc_id long, n_samples long, duration_ms long, "
            "peak long, mean_q4 long, energy_q4 long"
        ),
    )


# --------------------------------------------------------------------------
# q112 — Arrow-native batch histogram (mapInArrow, the lowest-overhead path)
# --------------------------------------------------------------------------
_AH_BUCKET = 100  # byte-length histogram bucket width


def _arrow_len_hist(batches):
    """pyarrow.compute kernels end to end — no pandas materialization:
    the per-batch histogram runs on Arrow buffers directly, which is
    the cheapest Python integration Spark offers (mapInArrow skips the
    Arrow→pandas conversion mapInPandas pays)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        lens = pc.binary_length(batch.column("payload"))
        buckets = pc.divide(lens, _AH_BUCKET)
        tbl = pa.table(
            {"source": batch.column("src"), "bucket": pc.cast(buckets, pa.int64())}
        )
        agg = tbl.group_by(["source", "bucket"]).aggregate([("bucket", "count")])
        yield pa.record_batch(
            {
                "source": agg.column("source").combine_chunks(),
                "bucket": agg.column("bucket").combine_chunks(),
                "partial_n": pc.cast(
                    agg.column("bucket_count"), pa.int64()
                ).combine_chunks(),
            }
        )


@query(
    "q112_mm_arrow_hist",
    oracle=f"""
SELECT source,
       CAST(length(text) // {_AH_BUCKET} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
""",
    tags=("multimodal", "arrow", "histogram"),
)
def q112_mm_arrow_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size histogram via ``mapInArrow`` — the Arrow-native
    sibling of the mapInPandas operators (q27/q96): record batches are
    processed with pyarrow.compute kernels, no pandas conversion, and
    each task emits PARTIAL per-batch histogram rows that a normal
    Spark aggregate then combines — the map-side-combine discipline
    expressed across the Python boundary.

    Scale: the Python stage is partition-local and emits
    ≲ sources×buckets rows per batch (not per row); the final combine
    is a metadata-sized hash aggregate. This is the integration tier a
    100 TB blob pipeline should use when pandas semantics aren't
    needed — one less columnar conversion per batch."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("source").alias("src"),
    )
    partial = blobs.mapInArrow(
        _arrow_len_hist, schema="source string, bucket long, partial_n long"
    )
    return partial.groupBy("source", "bucket").agg(
        F.sum("partial_n").cast("long").alias("n_docs")
    )

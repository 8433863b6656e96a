"""Cross-engine differential test for the shared text primitives on
adversarial strings.

The oracle gate hash-compares Spark and DuckDB, so ``tokens``/
``sql_tokens``, ``shingles``/``sql_shingles``, ``md5_str``, and
``hex_prefix_int``/``sql_hex_prefix_int`` must agree byte-for-byte on
whatever text a fixture contains. The fixtures are ASCII prose today;
this test pins agreement on the text a real corpus will contain —
emoji, CJK (no spaces), RTL Arabic, mixed scripts, accents, weird
whitespace, 50k-char tokens, empty and whitespace-only strings — so a
future fixture drift surfaces here as a named divergence instead of an
opaque driver hash mismatch.

Known boundary (documented, excluded): DuckDB VARCHAR cannot carry
NUL (``\\x00``) — a text column containing NUL can never round-trip
the oracle side, so the exact-match contract implicitly requires
NUL-free text. Spark handles NUL fine (the adversarial no-crash sweep
covers it); only the cross-engine comparison excludes it.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_pubsub_connector_spark.functions.textops import (
    hex_prefix_int,
    md5_str,
    shingles,
    sql_hex_prefix_int,
    sql_shingles,
    sql_tokens,
    tokens,
)

CASES = [
    "",
    " \t\n  ",
    "plain ascii words here",
    "😀🎉🚀 emoji only 🌍",
    "中文文本测试，没有空格的长句子",
    "مرحبا بالعالم هذا نص عربي",
    "mixed العربية and English و 中文 text",
    "ünïcödé àccénts çédille ñ",
    "a",
    "word " * 2000,
    "x" * 50_000,
    "line1\nline2\r\nline3\ttabbed words",
    "  leading and trailing   ",
    "non breaking space",  # U+00A0 is NOT \s in Java or RE2
    "ideographic\u3000space",  # U+3000: also outside ASCII \s
]


@pytest.fixture(scope="module")
def frames(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "cid INT, text STRING"
    )
    tok = df.select(
        "cid",
        tokens("text").alias("w"),
        md5_str(F.col("text")).alias("h"),
        hex_prefix_int(md5_str(F.col("text")), 8).alias("hp"),
    )
    out = tok.select(
        "cid",
        "w",
        F.size("w").alias("n_tok"),
        F.when(F.size("w") >= 3, shingles("w", 3)).alias("sh"),
        "h",
        "hp",
    ).collect()
    spark_rows = {
        r["cid"]: (list(r["w"]), r["n_tok"], r["sh"] and list(r["sh"]), r["h"], r["hp"])
        for r in out
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE adv(cid INT, text VARCHAR)")
    for i, s in enumerate(CASES):
        con.execute("INSERT INTO adv VALUES (?, ?)", [i, s])
    h = "md5(text)"
    rows = con.execute(
        f"""
        WITH t AS (SELECT cid, {sql_tokens('text')} AS w, {h} AS h FROM adv)
        SELECT cid, w, len(w) AS n_tok,
               CASE WHEN len(w) >= 3 THEN {sql_shingles('w', 3)} END AS sh,
               h, {sql_hex_prefix_int('h', 8)} AS hp
        FROM t
        """
    ).fetchall()
    duck_rows = {cid: (list(w), n, sh and list(sh), hh, hp) for cid, w, n, sh, hh, hp in rows}
    return spark_rows, duck_rows


def test_tokens_shingles_md5_agree_on_adversarial_text(frames):
    spark_rows, duck_rows = frames
    assert set(spark_rows) == set(duck_rows) == set(range(len(CASES)))
    for cid in spark_rows:
        s, d = spark_rows[cid], duck_rows[cid]
        assert s == d, (cid, CASES[cid][:40], s, d)


def test_md5_is_of_utf8_bytes(frames):
    """Unicode md5 must hash UTF-8 bytes on both engines."""
    import hashlib

    spark_rows, _ = frames
    for cid, case in enumerate(CASES):
        expected = hashlib.md5(case.encode("utf-8")).hexdigest()
        assert spark_rows[cid][3] == expected, (cid, case[:40])

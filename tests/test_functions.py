"""Unit tests for the scalar expression library (FIXTURES.md edge cases)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.cleaning import (
    first4_year,
    none_to_null,
    nullif_empty,
    parse_int_commas,
    parse_money,
    parse_pct,
    split_first,
    yes_no_to_bool,
)
from unified_firmographic_data_pipeline_spark.functions.keys import surrogate_key
from unified_firmographic_data_pipeline_spark.functions.text import (
    detect_lang,
    doc_fingerprint,
    punct_ratio,
    shingles,
    token_count,
    tokens,
)
from unified_firmographic_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)


def col_vals(spark, values, expr_fn, typ="string"):
    df = spark.createDataFrame([(v,) for v in values], f"c {typ}")
    return [r["out"] for r in df.select(expr_fn(F.col("c")).alias("out")).collect()]


def test_parse_money(spark):
    vals = col_vals(spark, ["$648,125", "$15,511.0", "$-1,234", "", None, "7"], parse_money)
    assert vals == [648125.0, 15511.0, -1234.0, None, None, 7.0]


def test_parse_pct(spark):
    vals = col_vals(spark, ["6%", "32.8%", "-5%", "", None], parse_pct)
    assert vals == [6.0, 32.8, -5.0, 0.0, 0.0]


def test_parse_int_commas(spark):
    vals = col_vals(spark, ["2,100,000", "42", "", None], parse_int_commas)
    assert vals == [2100000, 42, None, None]


def test_yes_no_to_bool(spark):
    vals = col_vals(spark, ["yes", "no", "", None, "YES"], yes_no_to_bool)
    assert vals == [True, False, False, False, False]


def test_none_to_null_and_nullif(spark):
    assert col_vals(spark, ["none", "Austin", ""], none_to_null) == [None, "Austin", ""]
    assert col_vals(spark, ["", "x", None], nullif_empty) == [None, "x", None]


def test_first4_year(spark):
    vals = col_vals(spark, ["1902 (as Minnesota Mining)", "2013", "1976 (reorganized 1984)"], first4_year)
    assert vals == [1902, 2013, 1976]


def test_split_first_escapes_regex(spark):
    # ' (' must be treated literally, not as a regex group open (E1 caveat)
    vals = col_vals(spark, ["3M Company (the conglomerate)", "Walmart"], split_first)
    assert vals == ["3M Company", "Walmart"]


def test_surrogate_key_matches_dbt_utils_golden(spark):
    """FIXTURES.md §6: byte-exact with dbt_utils 1.3.0 semantics."""
    df = spark.createDataFrame(
        [("Walmart", "WMT"), ("3M Company", None)], "name string, sym string"
    )
    out = {r["name"]: r["k"] for r in df.select("name", surrogate_key(["name", "sym"]).alias("k")).collect()}
    assert out["Walmart"] == hashlib.md5(b"Walmart-WMT").hexdigest()
    assert out["3M Company"] == hashlib.md5(b"3M Company-_dbt_utils_surrogate_key_null_").hexdigest()
    # 3-col with NULL middle component
    df3 = spark.createDataFrame([("A", None, "B")], "x string, y string, z string")
    k3 = df3.select(surrogate_key(["x", "y", "z"]).alias("k")).first()["k"]
    assert k3 == hashlib.md5(b"A-_dbt_utils_surrogate_key_null_-B").hexdigest()


def test_tokens_and_counts(spark):
    vals = col_vals(spark, ["a  b\tc", "", "  x  "], token_count)
    assert vals == [3, 0, 1]
    toks = col_vals(spark, ["hello  world"], tokens)
    assert toks == [["hello", "world"]]


def test_shingles(spark):
    out = col_vals(spark, ["a b c d", "a b"], lambda c: shingles(c, 3))
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n -> whole text


def test_fingerprint_normalizes(spark):
    a, b = col_vals(spark, ["Hello  World", "hello world"], doc_fingerprint)
    assert a == b


def test_punct_ratio(spark):
    (v,) = col_vals(spark, ["ab!?"], punct_ratio)
    assert v == pytest.approx(0.5)


def test_detect_lang(spark):
    vals = col_vals(
        spark,
        ["the cat and the dog of it", "el gato y la casa de los", "xyzzy qwer asdf"],
        detect_lang,
    )
    assert vals == ["en", "es", "und"]


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot("a", "b").alias("d"), l2_norm("a").alias("n"), cosine_similarity("a", "b").alias("c")
    ).first()
    assert row["d"] == 32.0
    assert row["n"] == pytest.approx(math.sqrt(14))
    expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert row["c"] == pytest.approx(expected)


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>")
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_strict_cast(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from unified_firmographic_data_pipeline_spark.functions.cleaning import strict_cast

    df = spark.createDataFrame([("12",), (None,)], ["s"])
    got = [r[0] for r in df.select(strict_cast("s", "int")).collect()]
    assert got == [12, None]

    bad = spark.createDataFrame([("12",), ("oops",)], ["s"])
    import pytest as _pytest
    with _pytest.raises(Exception, match="strict_cast to int failed"):
        bad.select(strict_cast("s", "int")).collect()


def test_lenient_cast(spark):
    from unified_firmographic_data_pipeline_spark.functions.cleaning import lenient_cast

    df = spark.createDataFrame([("12",), ("oops",), (None,)], ["s"])
    got = [r[0] for r in df.select(lenient_cast("s", "int")).collect()]
    assert got == [12, None, None]


def test_bpe_ish_pandas_tier_matches_expression(spark, sf_small):
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.functions.text import (
        bpe_ish_token_count,
        bpe_ish_token_count_pandas,
    )

    d = spark.read.parquet(f"{sf_small}/documents.parquet").limit(200)
    rows = d.select(
        bpe_ish_token_count("text").alias("jvm"),
        bpe_ish_token_count_pandas("text").alias("py"),
    ).collect()
    assert rows and all(r["jvm"] == r["py"] for r in rows)


def test_split_sentences_udtf(spark):
    from unified_firmographic_data_pipeline_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, None), (3, "No boundary")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
        (3, 0, "No boundary"),
    ]


def test_token_count_three_tiers_agree(spark):
    from unified_firmographic_data_pipeline_spark.functions.text import (
        bpe_ish_token_count,
        bpe_ish_token_count_pandas,
        with_bpe_ish_token_count_arrow,
    )

    df = spark.createDataFrame(
        [("hello, world 42!",), ("",), ("a-b_c 3.14",)], "text string"
    )
    expr = [r.n for r in df.select(bpe_ish_token_count("text").alias("n")).collect()]
    pand = [
        r.n for r in df.select(bpe_ish_token_count_pandas("text").alias("n")).collect()
    ]
    arrow = [
        r.n_tokens
        for r in with_bpe_ish_token_count_arrow(df, "text").select("n_tokens").collect()
    ]
    assert expr == pand == arrow

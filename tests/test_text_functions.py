"""Unit tests for the text-analysis expression helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.text import (
    fingerprint,
    quality_features,
    token_count,
    word_shingles,
)


def _shingles(spark, text: str, n: int = 3) -> list[str]:
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(word_shingles(F.col("text"), n).alias("s")).first()["s"]


def test_word_shingles_basic(spark):
    assert _shingles(spark, "a b c d") == ["a b c", "b c d"]


def test_word_shingles_exact_length(spark):
    assert _shingles(spark, "a b c") == ["a b c"]


def test_word_shingles_short_doc_is_empty(spark):
    # Docs shorter than n must yield an empty array, not [0, -1]-indexed
    # garbage (ANSI-mode element_at(toks, 0) would error).
    assert _shingles(spark, "a b") == []
    assert _shingles(spark, "a") == []


def test_token_count_and_quality(spark):
    df = spark.createDataFrame([("the cat sat",)], ["text"])
    feats = quality_features(F.col("text"))
    row = df.select(
        token_count(F.col("text")).alias("n"),
        feats["stopword_ratio"].alias("sw"),
    ).first()
    assert row["n"] == 3
    assert abs(row["sw"] - 1 / 3) < 1e-9


def test_fingerprint_normalizes_case_and_trim(spark):
    df = spark.createDataFrame([("  Hello World ", "hello world")], ["a", "b"])
    row = df.select(
        fingerprint(F.col("a")).alias("fa"), fingerprint(F.col("b")).alias("fb")
    ).first()
    assert row["fa"] == row["fb"]

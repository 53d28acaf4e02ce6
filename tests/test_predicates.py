"""Predicate/helper coverage: P4 image-format filter, content sniff,
P2 text-based, P5/A3 confidence filter, X3 language mapping."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medical_and_charity_document_extraction_system_spark.functions import predicates as P
from medical_and_charity_document_extraction_system_spark.operators.engines import map_language


def test_is_image_url(spark):
    rows = [
        ("a.jpg", True), ("b.JPEG", True), ("c.png", True), ("d.webp", True),
        ("e.tiff", True), ("f.pdf", False), ("g.html", False), ("h.jpg.txt", False),
    ]
    df = spark.createDataFrame(rows, ["url", "expected"])
    got = df.select("expected", P.is_image_url(F.col("url")).alias("got")).collect()
    assert all(r.got == r.expected for r in got)


def test_content_kind(spark):
    rows = [
        (1, b"%PDF-1.4 xyz"), (2, b"%FPDF\npage"), (3, b"\x89PNG\r\n"),
        (4, b"\xff\xd8\xff\xe0jfif"), (5, b"<html><body>"), (6, None),
        (7, b"P5\n2 2\n255\nabcd"),
    ]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("data", T.BinaryType())]
    )
    df = spark.createDataFrame(rows, schema)
    got = {r.id: r.kind for r in df.select("id", P.content_kind(F.col("data")).alias("kind")).collect()}
    assert got == {1: "pdf", 2: "fpdf", 3: "png", 4: "jpeg", 5: "html", 6: None, 7: "netpbm"}


def test_is_text_based(spark):
    df = spark.createDataFrame([("x" * 101,), ("x" * 100,)], ["t"])
    got = [r.b for r in df.select(P.is_text_based(F.col("t")).alias("b")).collect()]
    assert got == [True, False]


def test_confidence_filter_and_mean(spark):
    word = T.StructType(
        [T.StructField("text", T.StringType()), T.StructField("confidence", T.DoubleType())]
    )
    schema = T.StructType([T.StructField("words", T.ArrayType(word))])
    rows = [
        ([("a", 90.0), ("b", -1.0), ("c", 70.0)],),
        ([("x", -1.0)],),
        ([],),
    ]
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        F.size(P.confident_words(F.col("words"))).alias("n"),
        P.mean_confidence(F.col("words")).alias("m"),
    ).collect()
    assert [(r.n, r.m) for r in got] == [(2, 80.0), (0, 0.0), (0, 0.0)]


@pytest.mark.parametrize(
    "code,expected",
    [
        ("eng", "en"), ("ENG", "en"), ("deu", "de"), ("eng+fra", "en+fr"),
        ("eng+eng", "en"), ("en", "en"), ("xx", "xx"), (None, "en"), ("", "en"),
        ("chi_sim", "ch_sim"),
    ],
)
def test_map_language(code, expected):
    assert map_language(code) == expected

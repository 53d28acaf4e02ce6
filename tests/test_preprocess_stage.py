"""Spark image-preprocessing stage tests: binary PGM column ->
E/D/K/B chain -> binary + lineage columns (operators/preprocess.py),
fed by the deterministic page renderer (operators/multimodal.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medical_and_charity_document_extraction_system_spark.functions import netpbm
from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
    attach_page_images,
    render_page_image,
)
from medical_and_charity_document_extraction_system_spark.operators.preprocess import (
    preprocess_images,
)

N_DOCS = 21


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    return attach_page_images(ids).cache()


@pytest.fixture(scope="module")
def processed(media):
    return {r.media_id: r for r in preprocess_images(media).collect()}


def test_planted_skew_recovered(processed):
    checked = 0
    for mid, row in processed.items():
        planted = float((mid % 7) - 3)
        assert row.error is None
        if planted != 0.0:
            assert abs(row.skew_angle - planted) < 1.5, (mid, planted, row.skew_angle)
            checked += 1
    assert checked > 10


def test_output_is_binarized_netpbm(processed):
    for row in processed.values():
        img = netpbm.decode(bytes(row.image))
        assert set(np.unique(img)).issubset({0, 255})
        assert img.shape == (row.height, row.width)
        assert row.steps_applied == ["enhance", "denoise", "deskew", "binarize"]


def test_malformed_payload_degrades_to_error_row(spark):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, netpbm.encode(render_page_image(1))), (2, b"\x89PNG not netpbm")],
        schema,
    )
    rows = {r.media_id: r for r in preprocess_images(df).collect()}
    assert rows[1].error is None and rows[1].image is not None
    assert rows[2].error is not None and rows[2].image is None
    assert rows[2].steps_applied == []


def test_stage_deterministic(media):
    a = sorted(map(tuple, preprocess_images(media).collect()))
    b = sorted(map(tuple, preprocess_images(media).collect()))
    assert a == b


def test_render_is_pure_function_of_id():
    assert np.array_equal(render_page_image(7), render_page_image(7))
    assert not np.array_equal(render_page_image(7), render_page_image(8))

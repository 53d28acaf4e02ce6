"""SemDeDup (operators/similarity.semantic_dedup): planted duplicate
groups with explicit centroids, survivor rule, cross-cluster blindness,
rerun determinism."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.operators.similarity import (
    semantic_dedup,
)

# two orthogonal cluster directions in 4-d
CENTROIDS = np.array(
    [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], dtype=np.float64
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        # cluster 0: ids 1 and 2 nearly parallel (cos ~0.9999), id 3
        # well-separated (cos ~0.7 to both)
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.02, 0.0, 0.0]),
        (3, [1.0, 0.0, 1.0, 0.0]),
        # cluster 1: a vector nearly parallel to id 1 but assigned to
        # the OTHER centroid — SemDeDup must NOT see the pair
        (4, [0.4, 1.0, 0.0, 0.0]),
        # its in-cluster twin
        (5, [0.4, 1.0, 0.01, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _run(planted, threshold=0.95):
    return {
        r["vec_id"]: r
        for r in semantic_dedup(
            planted, dim=4, threshold=threshold, centroids=CENTROIDS
        ).collect()
    }


def test_survivor_is_lowest_id(planted):
    out = _run(planted)
    assert out[1]["keep"] and out[1]["max_prev_cos"] is None  # cluster-first
    assert not out[2]["keep"] and out[2]["max_prev_cos"] > 0.99
    assert out[3]["keep"]  # separated within the cluster


def test_cross_cluster_pairs_invisible(planted):
    out = _run(planted)
    assert out[4]["cid"] != out[1]["cid"]
    # id 4 is the first row of ITS cluster: no prev despite high
    # cosine to id 1 across the boundary
    assert out[4]["max_prev_cos"] is None and out[4]["keep"]
    assert not out[5]["keep"]


def test_threshold_moves_the_cut(planted):
    loose = _run(planted, threshold=0.999999)
    assert loose[2]["keep"]  # 0.9999 < cut now


def test_rerun_identity(planted):
    a = sorted(map(tuple, semedup_rows(planted)))
    b = sorted(map(tuple, semedup_rows(planted)))
    assert a == b


def semedup_rows(planted):
    return semantic_dedup(
        planted, dim=4, threshold=0.95, centroids=CENTROIDS
    ).collect()

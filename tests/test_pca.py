"""Deterministic PCA projection (operators/pca.py)."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.operators.pca import (
    pca_fit,
    pca_fit_np,
    pca_project,
)


def _emb(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_components_recover_planted_axes():
    # variance concentrated on axis 0, then axis 2
    rng_free = np.array(
        [[3.0 * ((i % 4) - 1.5), 0.1 * ((i % 2) - 0.5), ((i % 3) - 1.0), 0.0]
         for i in range(24)]
    )
    mean, comps = pca_fit_np(rng_free, k=2)
    assert abs(comps[0][0]) > 0.99      # first PC is axis 0
    assert abs(comps[1][2]) > 0.99      # second PC is axis 2
    # sign convention: dominant coordinate positive
    assert comps[0][np.argmax(np.abs(comps[0]))] > 0
    assert comps[1][np.argmax(np.abs(comps[1]))] > 0


def test_projection_matches_reference_fold(spark):
    mat = np.array(
        [[float((i * 7 + j * 3) % 11) for j in range(6)] for i in range(20)]
    )
    df = _emb(spark, mat)
    mean, comps = pca_fit(df, k=3)
    got = {
        (r.vec_id, r.component): r.value
        for r in pca_project(df, mean, comps).collect()
    }
    mean_l = [float(x) for x in mean]
    for i in range(20):
        v = [float(np.float32(x)) for x in mat[i]]  # float32 round trip
        for j in range(3):
            acc = 0.0
            for d in range(6):
                acc += (v[d] - mean_l[d]) * float(comps[j][d])
            assert got[(i, j)] == acc, (i, j)


def test_fit_is_partitioning_invariant(spark):
    mat = np.array([[float((i * 5 + j) % 7) for j in range(4)] for i in range(30)])
    df = _emb(spark, mat)
    m1, c1 = pca_fit(df, k=2)
    m2, c2 = pca_fit(df.repartition(7), k=2)
    assert np.array_equal(m1, m2) and np.array_equal(c1, c2)


def test_fit_rejects_bad_k(spark):
    df = _emb(spark, np.zeros((3, 4)))
    with pytest.raises(ValueError):
        pca_fit(df, k=0)
    with pytest.raises(ValueError):
        pca_fit(df, k=5)

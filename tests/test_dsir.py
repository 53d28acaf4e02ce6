"""DSIR importance resampling (operators/dsir.py): planted domain
separation, exact-k selection, feature-free docs, rerun identity."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    dsir_threshold,
    train_dsir,
)

TARGET_TEXT = "alpha beta gamma delta alpha beta gamma delta"
OFF_TEXT = "zork quux blarg frotz zork quux blarg frotz"


@pytest.fixture(scope="module")
def planted(spark):
    target = spark.createDataFrame(
        [(i, TARGET_TEXT) for i in range(5)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [
            (10, TARGET_TEXT),           # looks exactly like the target
            (11, "alpha beta " + OFF_TEXT),  # partial overlap
            (12, OFF_TEXT),              # off-domain
            (13, ""),                    # feature-free
        ],
        ["doc_id", "text"],
    )
    return target, raw


def test_target_like_docs_rank_higher(spark, planted):
    target, raw = planted
    ratios = train_dsir(target, raw)
    out = {r["doc_id"]: r for r in dsir_log_weights(raw, ratios).collect()}
    assert out[10]["log_weight"] > out[11]["log_weight"] > out[12]["log_weight"]
    # descale is the exact power-of-two division of the integer sum
    assert out[10]["log_weight"] == out[10]["logw_scaled"] / (1 << 40)


def test_feature_free_doc_weighs_zero(spark, planted):
    target, raw = planted
    ratios = train_dsir(target, raw)
    out = {r["doc_id"]: r for r in dsir_log_weights(raw, ratios).collect()}
    assert out[13]["n_feats"] == 0
    assert out[13]["logw_scaled"] == 0 and out[13]["log_weight"] == 0.0


def test_select_exactly_k(spark, planted):
    target, raw = planted
    ratios = train_dsir(target, raw)
    scored = dsir_log_weights(raw, ratios)
    # weight order: 10 (target-like, > 0) > 13 (empty, exactly 0) >
    # 11 (mostly off-domain, < 0) > 12 — the empty doc outranks
    # negative-weight docs, as log w = 0 should
    sel2 = dsir_select(scored, dsir_threshold(scored, k=2))
    assert {r["doc_id"] for r in sel2.collect() if r["selected"]} == {10, 13}
    sel3 = dsir_select(scored, dsir_threshold(scored, k=3))
    assert {r["doc_id"] for r in sel3.collect() if r["selected"]} == {10, 13, 11}


def test_empty_corpus_threshold(spark, planted):
    target, raw = planted
    ratios = train_dsir(target, raw)
    empty = dsir_log_weights(raw.where("doc_id < 0"), ratios)
    assert dsir_threshold(empty, k=3) is None
    assert dsir_select(empty, None).where("selected").count() == 0


def test_rerun_identity(spark, planted):
    target, raw = planted

    def run():
        ratios = train_dsir(target, raw)
        scored = dsir_log_weights(raw, ratios)
        return sorted(
            map(tuple, dsir_select(scored, dsir_threshold(scored, k=2)).collect())
        )

    assert run() == run()

"""Temperature mixing, shard assignment, and the shard file sink
(operators/mixing.py, sources/shards.py)."""

import glob
import gzip
import os

import pyspark.sql.functions as F

from medical_and_charity_document_extraction_system_spark.operators.mixing import (
    shard_assignments,
    shard_manifest,
    temperature_mix,
)
from medical_and_charity_document_extraction_system_spark.sources.shards import (
    read_training_shards,
    write_training_shards,
)


def _corpus(spark, n=120):
    # skewed sources: src0 gets 1/2 the docs, src1 1/3, src2 the rest
    rows = [
        (i, "src0" if i % 2 == 0 else ("src1" if i % 3 == 0 else "src2"),
         f"tok{i} tok{i + 1} tok{i + 2}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_temperature_mix_quota_shape(spark):
    df = _corpus(spark)
    out = temperature_mix(df, target_total=60).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    counts = {r["source"]: r["n"] for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # sqrt-weighting: the big source's share of the sample must be
    # SMALLER than its share of the corpus, the small source's larger
    big, small = "src0", "src2"
    assert per[big] / sum(per.values()) < counts[big] / sum(counts.values())
    assert per[small] / sum(per.values()) > counts[small] / sum(counts.values())
    # quota rule: ranks within each source are exactly 1..quota
    for src, n in per.items():
        ranks = sorted(r["rank"] for r in out if r["source"] == src)
        assert ranks == list(range(1, n + 1))


def test_temperature_mix_deterministic(spark):
    df = _corpus(spark)
    a = sorted((r["doc_id"]) for r in temperature_mix(df, 40).collect())
    b = sorted((r["doc_id"]) for r in temperature_mix(df.repartition(7), 40).collect())
    assert a == b


def test_shard_assignment_positions_dense(spark):
    df = _corpus(spark, 50)
    out = shard_assignments(df, n_shards=4).collect()
    byshard = {}
    for r in out:
        byshard.setdefault(r["shard"], []).append(r["position"])
    assert set(byshard) <= set(range(4))
    for sid, poss in byshard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shard_write_read_round_trip(spark, tmp_path):
    df = _corpus(spark, 60).select("doc_id", "text")
    out_dir = str(tmp_path / "shards")
    manifest = write_training_shards(df, out_dir, n_shards=4)
    assert sum(m[2] for m in manifest) == 60
    back = read_training_shards(spark, out_dir)
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    want = {(r["doc_id"], r["text"]) for r in df.collect()}
    assert got == want
    # file-name shard matches the md5 assignment for every doc
    joined = back.join(
        shard_assignments(df, n_shards=4).withColumnRenamed("shard", "shard2"),
        "doc_id",
    )
    assert joined.where("shard != shard2").count() == 0


def test_shard_files_byte_identical_across_runs(spark, tmp_path):
    df = _corpus(spark, 60).select("doc_id", "text")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, d1, n_shards=4)
    write_training_shards(df.repartition(5), d2, n_shards=4)
    f1 = sorted(glob.glob(os.path.join(d1, "*.jsonl.gz")))
    f2 = sorted(glob.glob(os.path.join(d2, "*.jsonl.gz")))
    assert [os.path.basename(p) for p in f1] == [os.path.basename(p) for p in f2]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()
        # members sorted by position => ids appear in md5-rank order
        lines = gzip.decompress(open(a, "rb").read()).decode().splitlines()
        assert all(l.startswith('{"doc_id":') for l in lines)


def test_manifest_matches_files(spark, tmp_path):
    df = _corpus(spark, 60).select("doc_id", "text")
    out_dir = str(tmp_path / "m")
    files = write_training_shards(df, out_dir, n_shards=4)
    man = {r["shard"]: r["n_docs"] for r in shard_manifest(df, n_shards=4).collect()}
    assert {s: n for s, _, n in files} == man

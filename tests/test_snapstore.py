"""Snapshot-versioned table store (plans/snapstore.py)."""

import os

import pytest

from medical_and_charity_document_extraction_system_spark.plans.snapstore import SnapshotTable


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_append_overwrite_time_travel(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    even = docs.where("doc_id % 2 = 0")
    odd = docs.where("doc_id % 2 = 1")
    s1 = t.commit(even, "append")
    s2 = t.commit(odd, "append")
    s3 = t.commit(docs.where("doc_id < 10"), "overwrite")
    assert (s1, s2, s3) == (1, 2, 3)
    n_even = even.count()
    n_all = docs.count()
    assert t.read(1).count() == n_even                      # time travel
    assert t.read(2).count() == n_all                       # append merged
    assert t.read(3).count() == 10                          # overwrite replaced
    assert t.read().count() == 10                           # current = latest
    # ids are disjoint per snapshot semantics
    assert {r.doc_id % 2 for r in t.read(1).collect()} == {0}
    # manifests carry exact row accounting
    assert t._manifest(2)["total_rows"] == n_all
    assert t._manifest(2)["added_rows"] == n_all - n_even


def test_rollback_republishes_old_files(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(docs.where("doc_id < 100"), "append")
    t.commit(docs.where("doc_id >= 100"), "append")
    s3 = t.rollback(1)
    assert t.read().count() == 100
    assert t.read(2).count() == docs.count()  # history intact
    assert t.snapshots()[-1]["operation"] == "rollback" and s3 == 3


def test_expire_snapshots_deletes_orphans_only(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(docs.where("doc_id < 50"), "append")       # files A
    t.commit(docs.where("doc_id >= 450"), "append")     # files A+B
    t.commit(docs.where("doc_id < 10"), "overwrite")    # files C
    n_before = len(os.listdir(t.data_dir))
    out = t.expire_snapshots(keep_last=1)
    assert out["expired_snapshots"] == [1, 2]
    # snapshot 3 references only C: A and B files physically removed
    assert len(os.listdir(t.data_dir)) == n_before - len(out["deleted_files"])
    assert t.read().count() == 10
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read(1)
    # expired data really gone, surviving data untouched
    live = set(t._manifest(3)["files"])
    assert live == set(os.listdir(t.data_dir))


def test_expire_keeps_shared_files(spark, docs, tmp_path):
    """An appended snapshot shares its parent's files; expiring the
    parent must NOT delete files the survivor still references."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(docs.where("doc_id < 50"), "append")
    t.commit(docs.where("doc_id >= 450"), "append")  # shares snap-1 files
    out = t.expire_snapshots(keep_last=1)
    assert out["expired_snapshots"] == [1] and out["deleted_files"] == []
    assert t.read().count() == 100


def test_log_swap_is_atomic_shape(spark, docs, tmp_path):
    """The log is replaced, never appended in place: a reader that
    opens it mid-commit sees either the old or the new complete log."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(docs.where("doc_id < 5"), "append")
    raw = open(t._log_path).read()
    import json

    parsed = json.loads(raw)  # always a complete valid document
    assert parsed[-1]["snapshot_id"] == 1
    assert not os.path.exists(t._log_path + ".tmp")


def test_deterministic_layout(spark, docs, tmp_path):
    """Same commits -> same file names and same metadata (no wall
    clock anywhere) — rerun-identity, the repo invariant."""
    import json

    layouts = []
    for d in ("a", "b"):
        t = SnapshotTable(spark, str(tmp_path / d))
        t.commit(docs.where("doc_id < 20").coalesce(1), "append")
        t.commit(docs.where("doc_id >= 480").coalesce(1), "append")
        layouts.append(
            (
                sorted(os.listdir(t.data_dir)),
                json.load(open(t._log_path)),
                t._manifest(2),
            )
        )
    assert layouts[0] == layouts[1]


def test_compact_rewrites_small_files(spark, docs, tmp_path):
    """Ten tiny append commits -> one compact -> a single data file
    with identical rows; history stays readable until expired, and
    expiry then reclaims every small file."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for k in range(10):
        t.commit(docs.where(f"doc_id % 10 = {k}").coalesce(1), "append")
    n_all = docs.count()
    assert t.read().count() == n_all
    files_before = len(t._manifest(10)["files"])
    assert files_before >= 10
    sid = t.compact(target_files=1)
    assert t.snapshots()[-1]["operation"] == "compact"
    assert len(t._manifest(sid)["files"]) == 1
    got = sorted(r.doc_id for r in t.read().collect())
    assert got == sorted(r.doc_id for r in docs.collect())
    assert t.read(5).count() == docs.where("doc_id % 10 < 5").count()  # history
    out = t.expire_snapshots(keep_last=1)
    assert len(out["deleted_files"]) == files_before
    assert len(os.listdir(t.data_dir)) == 1


def test_tagged_commit_is_idempotent(spark, docs, tmp_path):
    """The streaming-sink replay contract: committing the same tag
    twice returns the original snapshot and writes nothing new."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    s1 = t.commit(docs.where("doc_id < 50"), "append", tag="epoch-0")
    n_files = len(os.listdir(t.data_dir))
    s1b = t.commit(docs.where("doc_id < 50"), "append", tag="epoch-0")
    assert s1b == s1 == 1
    assert len(os.listdir(t.data_dir)) == n_files  # no new data files
    assert len(t.snapshots()) == 1
    s2 = t.commit(docs.where("doc_id >= 450"), "append", tag="epoch-1")
    assert s2 == 2 and t.read().count() == 100


def test_merge_upserts_and_inserts(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text")
    t.commit(base.repartition(4, "doc_id"), "append")
    from pyspark.sql import functions as F

    updates = base.where("doc_id < 5").select(
        "doc_id", F.lit("REVISED").alias("text")
    ).unionByName(
        spark.createDataFrame([(99999, "BRAND NEW")], "doc_id long, text string")
    )
    sid = t.merge(updates, "doc_id")
    cur = {r.doc_id: r.text for r in t.read().collect()}
    assert all(cur[i] == "REVISED" for i in range(5))
    assert cur[99999] == "BRAND NEW"
    n = base.count()
    assert len(cur) == n + 1
    assert t._manifest(sid)["total_rows"] == n + 1
    # untouched rows unchanged
    orig = {r.doc_id: r.text for r in base.collect()}
    assert all(cur[i] == orig[i] for i in orig if i >= 5)


def test_merge_preserves_time_travel(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text")
    s1 = t.commit(base, "append")
    from pyspark.sql import functions as F

    t.merge(base.where("doc_id = 0").select("doc_id", F.lit("X").alias("text")), "doc_id")
    old = {r.doc_id: r.text for r in t.read(s1).collect()}
    assert old[0] != "X"  # pre-merge snapshot untouched


def test_merge_is_file_granular_cow(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text")
    t.commit(base.repartition(8, "doc_id"), "append")
    m1 = t._manifest(1)
    assert len(m1["files"]) == 8
    from pyspark.sql import functions as F

    # one key touched -> exactly one file rewritten, seven carried
    sid = t.merge(
        base.where("doc_id = 7").select("doc_id", F.lit("Y").alias("text")),
        "doc_id",
    )
    m2 = t._manifest(sid)
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) == 7
    assert len(m2["added_files"]) >= 1


def test_merge_tag_idempotent_and_empty_table(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text").where("doc_id < 20")
    s1 = t.merge(base, "doc_id", tag="epoch-1")  # empty table: append
    assert t.read().count() == 20
    s2 = t.merge(base, "doc_id", tag="epoch-1")  # replayed epoch
    assert s1 == s2
    assert t.read().count() == 20


def test_merge_into_zero_file_parent_is_insert_only(spark, docs, tmp_path):
    # a parent snapshot with NO data files (empty-DataFrame commit) must
    # behave like an insert-only merge, not crash on parquet(*[])
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text").where("doc_id < 20")
    t.commit(base.limit(0), "append")
    sid = t.merge(base, "doc_id")
    assert t.read(sid).count() == 20
    assert t._manifest(sid)["total_rows"] == 20


def test_merge_rejects_duplicate_update_keys(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = docs.select("doc_id", "text").where("doc_id < 20")
    t.commit(base, "append")
    dup = base.where("doc_id < 2").unionByName(base.where("doc_id = 0"))
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(dup, "doc_id")
    # store unchanged: no partial snapshot published
    assert t.current_snapshot_id() == 1
    assert t.read().count() == 20


def _changes(t, s1, s2, key="doc_id"):
    return {
        (r.change_type, r[key]): r for r in t.changelog(s1, s2, key).collect()
    }


def test_changelog_insert_update_delete(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    s1 = t.commit(base, "append")
    # overwrite: 1 kept identical, 2 revised, 3 deleted, 4 inserted
    after = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string"
    )
    s2 = t.commit(after, "overwrite")
    got = _changes(t, s1, s2)
    assert set(got) == {
        ("update_before", 2),
        ("update_after", 2),
        ("insert", 4),
        ("delete", 3),
    }
    assert got[("update_before", 2)].text == "b"
    assert got[("update_after", 2)].text == "B"
    assert got[("delete", 3)].text == "c"
    assert got[("insert", 4)].text == "d"


def test_changelog_merge_suppresses_moved_rows(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    d = docs.select("doc_id", "text")
    s1 = t.commit(d.repartition(3, "doc_id"), "append")
    from pyspark.sql import functions as F

    upd = d.where("doc_id % 20 = 0").select(
        "doc_id", F.concat("text", F.lit("!")).alias("text")
    )
    s2 = t.merge(upd, "doc_id")
    out = t.changelog(s1, s2, "doc_id")
    n_upd = upd.count()
    by_type = {r.change_type: r.cnt for r in out.groupBy(
        F.col("change_type")).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # ONLY updates: the merge rewrote whole files, but unchanged rows
    # carried into new files must not surface as changes
    assert by_type == {"update_before": n_upd, "update_after": n_upd}


def test_changelog_identical_snapshots_and_compact(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    s1 = t.commit(docs.select("doc_id", "text").repartition(4), "append")
    same = t.changelog(s1, s1, "doc_id")
    assert same.count() == 0
    assert same.columns == ["change_type", "doc_id", "text"]
    # compact rewrites every file; content is unchanged -> zero changes
    s2 = t.compact(target_files=1)
    assert t.changelog(s1, s2, "doc_id").count() == 0


def test_changelog_file_granular_scan(spark, tmp_path):
    # only files added/removed between the manifests are read: with a
    # merge touching one of two files, the untouched file must not
    # appear in the plan's scan
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    left = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    right = spark.createDataFrame([(11, "x"), (12, "y")], "doc_id long, text string")
    t.commit(left, "append")
    s2 = t.commit(right, "append")
    files_before = set(t._manifest(s2)["files"])
    from pyspark.sql import functions as F

    s3 = t.merge(
        spark.createDataFrame([(1, "A")], "doc_id long, text string"), "doc_id"
    )
    cl = t.changelog(s2, s3, "doc_id")
    scanned = cl._jdf.queryExecution().executedPlan().toString()
    untouched = sorted(files_before & set(t._manifest(s3)["files"]))
    assert untouched, "merge should have carried the unmatched file"
    for f in untouched:
        assert f not in scanned
    got = {(r.change_type, r.doc_id) for r in cl.collect()}
    assert got == {("update_before", 1), ("update_after", 1)}


def test_schema_evolution_append(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    s1 = t.commit(v1, "append")
    v2 = spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    )
    s2 = t.commit(v2, "append")
    # current read: evolved schema, pre-evolution rows read NULL lang
    cur = t.read()
    assert cur.columns == ["doc_id", "text", "lang"]
    got = {r.doc_id: r.lang for r in cur.collect()}
    assert got == {1: None, 2: None, 3: "en"}
    # time travel: the pre-evolution snapshot keeps its own schema
    assert t.read(s1).columns == ["doc_id", "text"]
    # merge after evolution: CoW files mix schemas; survivors read
    # under the evolved schema
    t.merge(
        spark.createDataFrame(
            [(1, "a2", "de")], "doc_id long, text string, lang string"
        ),
        "doc_id",
    )
    got = {r.doc_id: (r.text, r.lang) for r in t.read().collect()}
    assert got == {1: ("a2", "de"), 2: ("b", None), 3: ("c", "en")}


def test_schema_evolution_rejects_type_change(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, "a")], "doc_id long, text string"), "append"
    )
    bad = spark.createDataFrame([(2, 5)], "doc_id long, text long")
    with pytest.raises(ValueError, match="schema evolution"):
        t.commit(bad, "append")


def test_legacy_manifest_without_schema_still_reads(spark, tmp_path):
    import json

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    sid = t.commit(
        spark.createDataFrame([(1, "a")], "doc_id long, text string"), "append"
    )
    # simulate a pre-schema-tracking manifest
    mp = os.path.join(str(tmp_path / "tbl"), "metadata", f"manifest-{sid}.json")
    m = json.load(open(mp))
    del m["schema"]
    json.dump(m, open(mp, "w"))
    assert {r.doc_id for r in t.read().collect()} == {1}

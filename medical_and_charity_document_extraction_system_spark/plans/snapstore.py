"""Snapshot-versioned table store — the Iceberg-shaped sink, for real.

SURVEY section 1.3 maps the reference's JSON result sink to an Iceberg
table; no Iceberg jars exist in this sandbox, so round 2 only wrote
plain parquet directories and *documented* the snapshot semantics.
This module implements the table-format core those semantics need, on
the same design Iceberg uses (spec at iceberg.apache.org/spec/):

- **immutable data files** under ``data/`` — a commit never mutates a
  written file, it writes new files and a new metadata version;
- **manifests**: ``metadata/manifest-<sid>.json`` lists exactly the
  data files (and row counts) visible in snapshot ``sid``;
- **snapshot log**: ``metadata/snapshot-log.json`` is the single table
  root pointer — appended copies are swapped in with ``os.replace``
  (atomic on POSIX), so readers always see a complete, valid log
  (the sandbox analog of Iceberg's atomic metadata-pointer swap);
- **append / overwrite commits**: append = parent's files + new
  files; overwrite = new files only; both create a NEW snapshot with
  a parent pointer — old snapshots stay readable (time travel);
- **rollback**: a new snapshot that re-exposes an old snapshot's file
  set (never deletes anything);
- **merge**: row-level upsert with file-granular copy-on-write —
  only data files containing a matched key are rewritten, the rest
  carry over by reference (the MERGE INTO cost model);
- **expire_snapshots**: retention (the S7 semantics, reference
  file_utils.cleanup_files:75-126) — drops old snapshots from the log
  and physically deletes data files no surviving snapshot references.

Determinism: snapshot ids are sequential ints and metadata carries no
wall-clock timestamps (rerun-identity is a repo invariant; Iceberg's
``committed_at`` would differ per run). Local-FS paths only — on a
real cluster this layer is replaced 1:1 by actual Iceberg commits,
which is why the public API (commit/read/rollback/expire) mirrors it.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------------ log
    @property
    def _log_path(self) -> str:
        return os.path.join(self.meta_dir, "snapshot-log.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else None

    def _write_log(self, snaps: list[dict]) -> None:
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._log_path)  # POSIX-atomic pointer swap

    def _manifest(self, sid: int) -> dict:
        with open(os.path.join(self.meta_dir, f"manifest-{sid}.json")) as f:
            return json.load(f)

    # --------------------------------------------------------- commit
    def _write_files(self, df: DataFrame, sid: int) -> tuple[list[str], int]:
        """Stage ``df`` as immutable data files for snapshot ``sid``.
        Returns (file names, row count — footer-level, no scan)."""
        staging = os.path.join(self.path, f"_staging-{sid}")
        df.write.mode("overwrite").parquet(staging)
        new_files = []
        i = 0
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            dst = f"snap{sid:06d}-{i:05d}.parquet"
            os.replace(
                os.path.join(staging, name), os.path.join(self.data_dir, dst)
            )
            new_files.append(dst)
            i += 1
        shutil.rmtree(staging, ignore_errors=True)
        rows = (
            self.spark.read.parquet(
                *[os.path.join(self.data_dir, f) for f in new_files]
            ).count()
            if new_files
            else 0
        )
        return new_files, rows

    def commit(
        self, df: DataFrame, operation: str = "append", tag: str | None = None
    ) -> int:
        """Write ``df``'s rows as new immutable data files and publish
        a new snapshot. ``operation``: 'append' (new files join the
        parent's) or 'overwrite' (table becomes exactly these files).
        ``tag`` makes the commit IDEMPOTENT: if a snapshot with the
        same tag already exists, its id is returned and nothing is
        written — the dedup handle a streaming foreachBatch sink needs
        so an epoch replayed after a crash-before-checkpoint cannot
        double-commit (Iceberg stores the same thing as
        snapshot summary properties). Returns the snapshot id."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown operation {operation!r}")
        snaps = self.snapshots()
        if tag is not None:
            for s in snaps:
                if s.get("tag") == tag:
                    return s["snapshot_id"]
        sid = snaps[-1]["snapshot_id"] + 1 if snaps else 1
        new_files, rows = self._write_files(df, sid)
        files = list(new_files)
        total = rows
        parent = snaps[-1]["snapshot_id"] if snaps else None
        if operation == "append" and parent is not None:
            pm = self._manifest(parent)
            files = pm["files"] + files
            total = pm["total_rows"] + rows
        manifest = {
            "snapshot_id": sid,
            "operation": operation,
            "parent": parent,
            "files": files,
            "added_files": new_files,
            "added_rows": rows,
            "total_rows": total,
            # Iceberg keeps the table schema in METADATA, not parquet
            # footers: an append with new columns EVOLVES the schema
            # (old columns keep their position/type; same-name type
            # changes are rejected), and every snapshot remembers the
            # schema it was read under — time travel to a
            # pre-evolution snapshot shows the pre-evolution columns.
            "schema": self._evolved_schema_json(
                df, parent if operation == "append" else None
            ),
        }
        with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        entry = {"snapshot_id": sid, "operation": operation, "parent": parent}
        if tag is not None:
            entry["tag"] = tag
        self._write_log(snaps + [entry])
        return sid

    def _evolved_schema_json(self, df: DataFrame, parent_sid: int | None) -> str:
        """The snapshot's schema as StructType json: the parent's
        columns (order and types preserved) plus any NEW columns the
        incoming frame adds, everything forced nullable (an evolved
        column is absent from pre-evolution files, so null is in its
        domain — the standard lakehouse rule). Same-name type changes
        raise."""
        import json as _json

        from pyspark.sql.types import StructField, StructType

        new_fields = [
            StructField(f.name, f.dataType, True) for f in df.schema.fields
        ]
        if parent_sid is not None:
            pm = self._manifest(parent_sid)
            if pm.get("schema"):
                parent = StructType.fromJson(_json.loads(pm["schema"]))
                by_name = {f.name: f for f in new_fields}
                for pf in parent.fields:
                    nf = by_name.get(pf.name)
                    if nf is not None and nf.dataType != pf.dataType:
                        raise ValueError(
                            f"schema evolution cannot change column "
                            f"{pf.name!r} from {pf.dataType.simpleString()} "
                            f"to {nf.dataType.simpleString()}"
                        )
                pnames = {f.name for f in parent.fields}
                merged = list(parent.fields) + [
                    f for f in new_fields if f.name not in pnames
                ]
                return StructType(merged).json()
        return StructType(new_fields).json()

    def merge(
        self, updates: DataFrame, key_col: str, tag: str | None = None
    ) -> int:
        """Row-level upsert (Iceberg MERGE INTO, copy-on-write): rows
        in ``updates`` REPLACE current rows with the same key; unseen
        keys are inserted. File-granular CoW: only data files that
        contain a matched key are rewritten (their unmatched rows are
        carried into the replacement files); every other file is
        referenced unchanged by the new snapshot — at 10^12 rows the
        rewrite cost is proportional to the touched files, not the
        table, which is exactly why Iceberg does it this way. Old
        snapshots keep reading the pre-merge files (time travel
        unaffected). ``tag`` gives the same replay-idempotency as
        commit. ``updates`` must be key-unique — duplicates would
        leave multiple current rows per key, so they raise (Iceberg
        MERGE errors on multi-match too). A zero-data-file parent
        (empty commit) degrades to insert-only. Returns the new
        snapshot id."""
        from pyspark.sql import functions as F

        snaps = self.snapshots()
        if tag is not None:
            for s in snaps:
                if s.get("tag") == tag:
                    return s["snapshot_id"]
        if not snaps:
            return self.commit(updates, "append", tag=tag)
        parent = snaps[-1]["snapshot_id"]
        pm = self._manifest(parent)
        files = pm["files"]
        paths = [os.path.join(self.data_dir, f) for f in files]
        # duplicate keys in `updates` would all survive the union and
        # leave multiple current rows per key — a silent upsert-invariant
        # violation; fail loudly instead (Iceberg MERGE does the same:
        # "multiple rows match" is an error, not last-writer-wins)
        key_rows = updates.groupBy(key_col).count()
        if key_rows.where(F.col("count") > 1).take(1):
            raise ValueError(
                f"merge updates contain duplicate values of {key_col!r}; "
                "dedup the batch before merging"
            )
        keys = updates.select(key_col).distinct()
        if paths:
            # which files hold a matched key: one metadata-light
            # semi-join; the collect is bounded by FILE count, never
            # row count
            cur = self.spark.read.parquet(*paths).select(
                key_col, F.input_file_name().alias("_f")
            )
            hit_paths = sorted(
                r["_f"]
                for r in cur.join(keys, key_col, "left_semi")
                .select("_f")
                .distinct()
                .collect()
            )
        else:
            # parent snapshot has no data files (empty-table commit):
            # behave as an insert-only merge
            hit_paths = []
        hit_names = {os.path.basename(p) for p in hit_paths}
        carried = [f for f in files if f not in hit_names]
        sid = parent + 1
        if hit_paths:
            if pm.get("schema"):
                from pyspark.sql.types import StructType

                hit_df = self.spark.read.schema(
                    StructType.fromJson(json.loads(pm["schema"]))
                ).parquet(*hit_paths)
            else:
                hit_df = self.spark.read.parquet(*hit_paths)
            survivors = hit_df.join(keys, key_col, "left_anti")
            new_data = survivors.unionByName(updates)
            # footer-level count over the one shared read
            hit_rows = hit_df.count()
        else:
            new_data = updates
            hit_rows = 0
        new_files, rows = self._write_files(new_data, sid)
        manifest = {
            "snapshot_id": sid,
            "operation": "merge",
            "parent": parent,
            "files": carried + new_files,
            "added_files": new_files,
            "added_rows": rows,
            "total_rows": pm["total_rows"] - hit_rows + rows,
        }
        if pm.get("schema"):
            manifest["schema"] = pm["schema"]
        with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        entry = {"snapshot_id": sid, "operation": "merge", "parent": parent}
        if tag is not None:
            entry["tag"] = tag
        self._write_log(snaps + [entry])
        return sid

    # ----------------------------------------------------------- read
    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """The table at a snapshot (default: current) — time travel is
        just reading an older manifest's file list."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise ValueError("table has no snapshots")
        if not any(s["snapshot_id"] == sid for s in self.snapshots()):
            raise ValueError(f"unknown or expired snapshot {sid}")
        m = self._manifest(sid)
        files = m["files"]
        stored = m.get("schema")
        if stored:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(stored))
            if not files:
                return self.spark.createDataFrame([], schema)
            # explicit schema: files written BEFORE a column was added
            # simply lack it and read as NULL — no footer merging, the
            # Iceberg read path
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.data_dir, f) for f in files]
            )
        # legacy manifests (pre-schema-tracking) read by footer inference
        if not files:
            return self.spark.range(0).drop("id")
        return self.spark.read.parquet(
            *[os.path.join(self.data_dir, f) for f in files]
        )

    def changelog(
        self, from_snapshot_id: int, to_snapshot_id: int, key_col: str
    ) -> DataFrame:
        """Incremental read (Iceberg's changelog scan, CDC shape):
        the row-level changes that turn the ``from`` snapshot into the
        ``to`` snapshot, as (change_type, ...row) with change_type in
        'insert' / 'delete' / 'update_before' / 'update_after' —
        updates emit BOTH the pre- and post-image row, exactly like
        Iceberg's changelog / Delta's CDF.

        File-granular: data files shared by both manifests are
        immutable and identical, so they cannot contribute changes and
        are never read — only files added or removed between the two
        snapshots are scanned, making CDC cost proportional to the
        churn, not the table (the same property merge()'s
        copy-on-write buys the write side). Because merge rewrites
        WHOLE files (carrying unmatched survivor rows into new files),
        a row can change files without changing content; the full
        outer join below content-compares with null-safe struct
        equality and emits nothing for moved-but-identical rows.

        Contract: the table must be key-unique per snapshot on
        ``key_col`` (what merge() maintains and enforces); plain
        append commits that introduce duplicate keys make per-key
        diffing ill-defined.
        """
        from pyspark.sql import functions as F

        mf = self._manifest(from_snapshot_id)
        mt = self._manifest(to_snapshot_id)
        f_from, f_to = set(mf["files"]), set(mt["files"])
        removed = sorted(f_from - f_to)
        added = sorted(f_to - f_from)

        def _read(names: list[str]) -> DataFrame | None:
            if not names:
                return None
            return self.spark.read.parquet(
                *[os.path.join(self.data_dir, n) for n in names]
            )

        old, new = _read(removed), _read(added)
        schema_src = new if new is not None else old
        if schema_src is None:
            # identical file sets: zero changes, but keep the schema
            any_files = sorted(f_to or f_from)
            base = (
                self.spark.read.parquet(
                    os.path.join(self.data_dir, any_files[0])
                )
                if any_files
                else self.spark.range(0).drop("id")
            )
            others = [c for c in base.columns if c != key_col]
            return base.where(F.lit(False)).select(
                F.lit("insert").alias("change_type"),
                *([key_col] if key_col in base.columns else []),
                *others,
            )
        cols = schema_src.columns
        if old is None:
            old = schema_src.where(F.lit(False))
        if new is None:
            new = schema_src.where(F.lit(False))
        val_cols = [c for c in cols if c != key_col]
        o = old.select(
            F.col(key_col).alias("_k"),
            F.struct(*[F.col(c) for c in val_cols]).alias("_ov"),
        )
        n = new.select(
            F.col(key_col).alias("_k"),
            F.struct(*[F.col(c) for c in val_cols]).alias("_nv"),
        )
        j = o.join(n, "_k", "full_outer")
        ins = j.where(F.col("_ov").isNull() & F.col("_nv").isNotNull()).select(
            F.lit("insert").alias("change_type"), "_k", F.col("_nv").alias("_v")
        )
        dele = j.where(F.col("_nv").isNull() & F.col("_ov").isNotNull()).select(
            F.lit("delete").alias("change_type"), "_k", F.col("_ov").alias("_v")
        )
        changed = j.where(
            F.col("_ov").isNotNull()
            & F.col("_nv").isNotNull()
            & ~F.col("_ov").eqNullSafe(F.col("_nv"))
        )
        upd_b = changed.select(
            F.lit("update_before").alias("change_type"),
            "_k",
            F.col("_ov").alias("_v"),
        )
        upd_a = changed.select(
            F.lit("update_after").alias("change_type"),
            "_k",
            F.col("_nv").alias("_v"),
        )
        out = ins.unionByName(upd_b).unionByName(upd_a).unionByName(dele)
        return out.select(
            "change_type",
            F.col("_k").alias(key_col),
            *[F.col("_v." + c).alias(c) for c in val_cols],
        )

    def rollback(self, snapshot_id: int) -> int:
        """Publish a NEW snapshot exposing an old snapshot's file set
        (history stays intact — Iceberg's rollback semantics)."""
        old = self._manifest(snapshot_id)  # raises if unknown
        snaps = self.snapshots()
        sid = snaps[-1]["snapshot_id"] + 1
        manifest = {
            "snapshot_id": sid,
            "operation": "rollback",
            "parent": snaps[-1]["snapshot_id"],
            "files": old["files"],
            "added_files": [],
            "added_rows": 0,
            "total_rows": old["total_rows"],
        }
        if old.get("schema"):
            manifest["schema"] = old["schema"]
        with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._write_log(
            snaps
            + [{"snapshot_id": sid, "operation": "rollback",
                "parent": snaps[-1]["snapshot_id"]}]
        )
        return sid

    def compact(self, target_files: int = 1) -> int:
        """Small-files maintenance (Iceberg's rewrite_data_files): read
        the current snapshot, rewrite its rows into ``target_files``
        data files, and publish the result as an overwrite snapshot.
        Rows are unchanged; history stays time-travelable; a following
        expire_snapshots reclaims the small files. Returns the new
        snapshot id."""
        cur = self.current_snapshot_id()
        if cur is None:
            raise ValueError("nothing to compact")
        sid = self.commit(self.read(cur).coalesce(target_files), "overwrite")
        snaps = self.snapshots()
        snaps[-1]["operation"] = "compact"
        self._write_log(snaps)
        m = self._manifest(sid)
        m["operation"] = "compact"
        with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
            json.dump(m, f, indent=1)
        return sid

    # --------------------------------------------------------- expire
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Retention: keep the newest ``keep_last`` snapshots, delete
        the rest from the log, and physically remove data files no
        surviving snapshot references. Returns what was removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"expired_snapshots": [], "deleted_files": []}
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live = set()
        for s in keep:
            live.update(self._manifest(s["snapshot_id"])["files"])
        deleted = []
        for s in drop:
            sid = s["snapshot_id"]
            for f in self._manifest(sid)["files"]:
                if f not in live and f not in deleted:
                    p = os.path.join(self.data_dir, f)
                    if os.path.exists(p):
                        os.remove(p)
                    deleted.append(f)
            os.remove(os.path.join(self.meta_dir, f"manifest-{sid}.json"))
        self._write_log(keep)
        return {
            "expired_snapshots": [s["snapshot_id"] for s in drop],
            "deleted_files": sorted(deleted),
        }

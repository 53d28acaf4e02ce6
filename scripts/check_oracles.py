"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB against the same sf dir, compares row count, column names,
and a value hash computed over columns sorted by name (rows sorted by
their full tuple) — the same comparison shape the driver uses.

    python scripts/check_oracles.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"  # bit-exact bar: the in-repo contract test
        # compares full-precision reprs, so hold this checker to it too
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--only", default="")
    args = p.parse_args()

    import __spark_entry__ as entry_mod
    from medical_and_charity_document_extraction_system_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entry_mod.queries()
    # pass the target dir so data-derived oracle literals (lm vocab,
    # IVF centroids, bm25 idf/avgdl) are re-derived from the same
    # parquet the Spark queries read — the gate is sf-portable
    sqls = entry_mod.oracle_sql(args.sf_dir)
    only = {s for s in args.only.split(",") if s}

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"{name}: SPARK_ERROR {e}", flush=True)
            continue
        if name not in sqls:
            results[name] = {
                "status": "ROWS_ONLY", "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(f"{name}: ROWS_ONLY rows={len(srows)}", flush=True)
            continue
        try:
            rel = con.execute(sqls[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"{name}: ORACLE_ERROR {e}", flush=True)
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = table_hash(scols, srows)
        oh = table_hash(ocols, orows)
        ok_hash = ok_cols and sh == oh
        status = "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        results[name] = {
            "status": status,
            "rows": (len(srows), len(orows)),
            "cols_ok": ok_cols,
            "hash": (sh, oh),
            "sec": round(time.time() - t0, 1),
        }
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} cols_ok={ok_cols} "
              f"hash={'ok' if ok_hash else (sh + '!=' + oh)} "
              f"[{results[name]['sec']}s]", flush=True)
        if status == "MISMATCH" and ok_cols:
            # print a tiny diff sample to debug
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {"\x1f".join(norm_cell(r[i]) for i in order) for r in srows}
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = {"\x1f".join(norm_cell(r[i]) for i in oorder) for r in orows}
            for ln in list(sset - oset)[:3]:
                print(f"   spark-only: {ln[:200]}")
            for ln in list(oset - sset)[:3]:
                print(f"   oracle-only: {ln[:200]}")

    bad = [n for n, r in results.items() if r["status"] not in ("MATCH", "ROWS_ONLY")]
    print(json.dumps({"bad": bad, "n": len(results)}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

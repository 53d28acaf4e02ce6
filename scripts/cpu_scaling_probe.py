"""Attribution probe for scaling efficiency: run the extraction
per-document kernel (HTML strip + spans + rollup) under plain
multiprocessing at N and 4N processes — no Spark. If this probe
scales ~linearly, any bench shortfall is Spark-side (scheduling,
Arrow, GC); if the probe itself is sublinear, the ceiling is hardware
(memory bandwidth / clock scaling) and applies to ANY engine on this
box.

    python scripts/cpu_scaling_probe.py [--n 8] [--docs 60000]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_docs(n: int) -> list[tuple[str, bytes]]:
    from medical_and_charity_document_extraction_system_spark.sources.pages import render_html, url_for

    return [(url_for(i), render_html(i, f"synthetic body text {i} " * 40)) for i in range(n)]


def work(chunk: list[tuple[str, bytes]]) -> int:
    from medical_and_charity_document_extraction_system_spark.config import DEFAULT_CONFIG
    from medical_and_charity_document_extraction_system_spark.plans.pipeline import _process_html

    total = 0
    for url, payload in chunk:
        rec = _process_html(url, payload, "en", DEFAULT_CONFIG)
        total += rec["total_characters"]
    return total


def run(nproc: int, docs: list, chunks: int) -> float:
    size = len(docs) // chunks
    parts = [docs[i * size : (i + 1) * size] for i in range(chunks)]
    with mp.Pool(nproc) as pool:
        pool.map(work, parts[:nproc])  # warm imports
        t0 = time.time()
        pool.map(work, parts)
        return time.time() - t0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--docs", type=int, default=60000)
    args = p.parse_args()
    docs = make_docs(args.docs)
    t_small = run(args.n, docs, chunks=128)
    t_big = run(args.n * 4, docs, chunks=128)
    ratio = t_small / t_big
    print(
        {
            "n": args.n,
            "t_N_sec": round(t_small, 2),
            "t_4N_sec": round(t_big, 2),
            "speedup": round(ratio, 2),
            "efficiency": round(ratio / 4.0, 3),
        }
    )


if __name__ == "__main__":
    main()

"""Planted-skew stress tests for the r4 shuffle operators.

Mirrors the LSH hot-bucket stress (test_dedup.py): each test plants a
degenerate key distribution a 100-TB corpus WILL contain — a stopword
term hitting ~every document, one mega-duplicated text window, one
dominant host — and pins (a) correctness under the skew and (b) a
generous wall-clock budget at local[8]. The budgets are deliberately
loose (the box drifts +/-30%, CLAUDE.md): they catch the
single-task-hotspot failure mode (minutes, not seconds), not a 20%
regression. Plan-shape asserts in the per-operator test files are the
precise guards; these are the end-to-end backstop.
"""

import time

BUDGET_SEC = 90


def test_inverted_index_hot_term_within_budget(spark):
    """30% of all token positions are the same stopword: with the old
    Window.partitionBy('term') df every 'the'-posting landed in ONE
    window partition; the agg+join form map-side combines."""
    from medical_and_charity_document_extraction_system_spark.operators.index import (
        inverted_index,
    )

    n_docs = 4000
    rows = [
        (
            i,
            " ".join(
                "the" if (j + i) % 3 == 0 else f"w{(i * 31 + j * 7) % 997}"
                for j in range(30)
            ),
        )
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    out = inverted_index(df, min_df=2)
    hot = out.where("term = 'the'")
    n_hot = hot.count()
    df_val = hot.select("df").first()["df"]
    elapsed = time.time() - t0
    assert n_hot == n_docs  # every doc posts the hot term
    assert df_val == n_docs
    assert elapsed < BUDGET_SEC, f"hot-term index took {elapsed:.0f}s"


def test_span_dedup_mega_duplicated_window_within_budget(spark):
    """One 12-token window duplicated across 60% of the corpus: its
    whash is a single groupBy key (map-side combinable) and the
    dup-window join back is AQE-splittable — must not hotspot."""
    from medical_and_charity_document_extraction_system_spark.operators.textdedup import (
        span_dedup,
    )

    mega = " ".join(f"dup{j}" for j in range(12))
    rows = []
    for i in range(1500):
        uniq = " ".join(f"u{i}x{j}" for j in range(12))
        rows.append((i, f"{mega} {uniq}" if i % 5 < 3 else f"{uniq} more{i} words{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    out = {r["doc_id"]: r for r in span_dedup(df, k=12).collect()}
    elapsed = time.time() - t0
    # canonical occurrence (doc 0) keeps the window; every other
    # mega-carrier loses exactly those 12 tokens
    assert out[0]["n_removed"] == 0
    carriers = [i for i in range(1500) if i % 5 < 3]
    assert all(out[i]["n_removed"] == 12 for i in carriers[1:])
    assert all(out[i]["n_removed"] == 0 for i in range(1500) if i % 5 >= 3)
    assert elapsed < BUDGET_SEC, f"mega-window span_dedup took {elapsed:.0f}s"


def test_pagerank_dominant_host_within_budget(spark):
    """Every node links to node 0 (a 30k-in-degree hub): the inflow
    groupBy('dst') is map-side combinable so the hub key reduces to
    one partial per task, never one task pulling 30k rows."""
    from medical_and_charity_document_extraction_system_spark.operators.webgraph import (
        pagerank_fixed,
    )

    n = 30_000
    edges = spark.range(1, n).selectExpr("id AS src", "CAST(0 AS LONG) AS dst")
    # plus a sparse ring so non-hub nodes have inflow too
    ring = spark.range(1, n).selectExpr("id AS src", "(id % (30000 - 1)) + 1 AS dst")
    t0 = time.time()
    ranks = {
        r.node: r.rank_units
        for r in pagerank_fixed(edges.union(ring), iterations=3).collect()
    }
    elapsed = time.time() - t0
    assert len(ranks) == n
    # the hub dominates every spoke
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0) * 100
    assert elapsed < BUDGET_SEC, f"dominant-host pagerank took {elapsed:.0f}s"


def test_bpe_wide_vocab_within_budget(spark):
    """BPE training cost must track VOCABULARY size, not corpus size:
    20k distinct words (every round re-folds the full word table)
    through 4 merge rounds inside the budget, and the learned merges
    must equal the Python twin's on the same counts."""
    import time

    from medical_and_charity_document_extraction_system_spark.operators.bpe import (
        bpe_train,
        bpe_train_python,
        word_counts,
    )

    rows = [
        (i, " ".join(f"w{j:05d}x" for j in range(i % 40, i % 40 + 25)))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.monotonic()
    merges, _ = bpe_train(df, 4)
    elapsed = time.monotonic() - t0
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    pm, _ = bpe_train_python(wc, 4)
    assert merges == pm
    assert elapsed < BUDGET_SEC, f"wide-vocab bpe took {elapsed:.0f}s"


def test_shingle_jaccard_max_df_bounds_boilerplate_blowup(spark):
    """One boilerplate shingle shared by EVERY doc would alone emit
    n^2/2 join rows in exact mode; with max_df it is excluded from
    the join and the query completes within budget, emitting only the
    genuinely-similar pairs (which share plenty of under-cap grams)."""
    import time

    from medical_and_charity_document_extraction_system_spark.operators.sparsesim import (
        shingle_jaccard_pairs,
    )

    boiler = "copyright footer terms"
    rows = []
    for i in range(4000):
        # 40 groups of 100 near-identical docs + the global boilerplate
        body = " ".join(f"g{i % 40}w{j}" for j in range(12))
        rows.append((i, f"{body} {boiler}"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    t0 = time.monotonic()
    out = shingle_jaccard_pairs(df, t_num=1, t_den=2, max_df=200)
    n = out.count()
    elapsed = time.monotonic() - t0
    # each group of 100 identical docs -> C(100,2) pairs
    assert n == 40 * 100 * 99 // 2
    assert elapsed < BUDGET_SEC, f"capped similarity join took {elapsed:.0f}s"


def test_edit_distance_hot_segment_within_budget(spark):
    """Adversarial PassJoin skew: thousands of strings share segment 0
    verbatim ("AAAAA" prefix) but differ far beyond max_dist in the
    tail — a worst case where the hot (len, 0, 'AAAA…') build key
    pairs ~everything with ~everything and the banded-levenshtein
    verify must reject nearly all of it. Pins that the verify is the
    cheap banded form (O(len*d) early-abort), not full DP, and that
    the join stays an equi-join."""
    from medical_and_charity_document_extraction_system_spark.operators.editsim import (
        edit_distance_pairs,
    )

    import hashlib

    def tail(i):
        h = hashlib.md5(f"tail:{i}".encode()).hexdigest()
        return "".join(chr(97 + int(h[j] + h[j + 1], 16) % 26) for j in range(19))

    n = 2500
    rows = [(i, "AAAAA" + tail(i)) for i in range(n)]
    # plant exactly one true near-dup pair
    rows.append((n, rows[0][1][:-1] + "!"))
    df = spark.createDataFrame(rows, "id long, s string").repartition(8)
    t0 = time.time()
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
    }
    elapsed = time.time() - t0
    assert (0, n) in got
    # random 19-char tails at dist<=2 are combinatorially implausible
    assert len(got) < 20
    assert elapsed < BUDGET_SEC, f"hot-segment edit join took {elapsed:.0f}s"


def test_interval_coverage_whale_user_within_budget(spark):
    """One user holding 80% of all events serializes only its own
    window partition (the documented sessionize bound): a 60k-event
    whale plus 5k spread users must finish inside the budget and
    produce exactly one island for the whale's overlapping chain."""
    import time

    from pyspark.sql import functions as F

    from medical_and_charity_document_extraction_system_spark.operators.eventstats import (
        interval_coverage,
    )

    n_whale, n_rest = 60_000, 5_000
    base = spark.range(n_whale + n_rest).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < n_whale, F.lit(0))
        .otherwise(F.col("id"))
        .alias("user_id"),
        # whale events start 1s apart with 10s durations: one island
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        F.lit(10.0).alias("value"),
    )
    t0 = time.time()
    out = interval_coverage(base)
    whale = out.where("user_id = 0").collect()
    n_islands = out.count()
    elapsed = time.time() - t0
    assert len(whale) == 1 and whale[0].n_events == n_whale
    assert n_islands == 1 + n_rest
    assert elapsed < BUDGET_SEC, f"whale interval_coverage took {elapsed:.0f}s"


def test_event_transitions_whale_user_within_budget(spark):
    """Same whale shape through the transition lag window: output
    stays |types|^2-bounded and the whale partition streams."""
    import time

    from pyspark.sql import functions as F

    from medical_and_charity_document_extraction_system_spark.operators.eventstats import (
        event_transitions,
    )

    n = 80_000
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 17 == 0).cast("long").alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
    )
    t0 = time.time()
    out = event_transitions(base.withColumn("value", F.lit(0.0)))
    rows = out.collect()
    elapsed = time.time() - t0
    assert 0 < len(rows) <= 25  # |types|^2 bound
    assert sum(r.n_trans for r in rows) == n - 2  # two users
    assert elapsed < BUDGET_SEC, f"whale transitions took {elapsed:.0f}s"


def test_interval_overlap_join_whale_user_within_budget(spark):
    """The interval-overlap join's skew story: a whale user owning
    most intervals on BOTH sides hashes to one (key, bin) partition
    stream, but the bin explosion spreads its intervals across many
    bins, so the equi-join stays AQE-splittable. 20k x 20k whale
    intervals laid out so each bin meets ~2 per side must finish
    inside budget with the exact pair count (each left interval
    overlaps its right twin and the next one)."""
    import time

    from pyspark.sql import functions as F

    from medical_and_charity_document_extraction_system_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    n = 20_000
    w = 10_000_000  # 10s bins
    left = spark.range(n).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("l_id"),
        (F.col("id") * w).alias("l_start_us"),
        (F.col("id") * w + w // 2).alias("l_end_us"),
    )
    right = spark.range(n).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("r_id"),
        (F.col("id") * w + w // 4).alias("r_start_us"),
        (F.col("id") * w + w + w // 4).alias("r_end_us"),
    )
    t0 = time.time()
    out = interval_overlap_join(
        left, right, "user_id",
        l_start="l_start_us", l_end="l_end_us",
        r_start="r_start_us", r_end="r_end_us",
        bin_width_us=w,
    )
    n_pairs = out.count()
    elapsed = time.time() - t0
    # left i overlaps right i ([i*w + w/4, i*w + w/2]) and right i-1
    # (its tail [i*w, i*w + w/4] covers left i's head)
    assert n_pairs == 2 * n - 1
    assert elapsed < BUDGET_SEC, f"whale interval join took {elapsed:.0f}s"

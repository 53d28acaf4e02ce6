"""Benchmark decontamination: n-gram overlap against an eval set.

Training-data pipelines must drop (or at least flag) corpus documents
that overlap the benchmarks the trained model will be scored on —
otherwise eval numbers measure memorization. The standard recipe
(GPT-3 appendix C, The Pile §6.3, FineWeb) is exact word-13-gram
overlap: a document is contaminated if any of its 13-grams appears in
the benchmark set. The reference repo has no analog (it serves one
extraction request at a time, reference
``backend/app/api/routes/ocr_routes.py:28``); this operator is part
of the LLM-data-pipeline layer the engine adds on top of extraction.

Semantics per corpus document:

- ``n_grams``      — the document's DISTINCT word n-gram count;
- ``n_hits``       — how many of those distinct n-grams occur in the
  benchmark set (each distinct gram counted once, however often it
  repeats in either side);
- ``contaminated`` — ``n_hits >= 1``.

Scale shape: the benchmark side is an eval suite — millions of
n-grams at most, versus the 10^12-document corpus — so the overlap
join broadcasts the benchmark grams and the corpus side never
shuffles on the gram key at all: explode → broadcast-semi-count →
groupBy(doc_id), a map-side-combinable agg keyed by doc. A
corpus-frequent gram ("of the united states of …") therefore cannot
concentrate on one reducer. If the benchmark set ever outgrows
broadcast range, drop the hint and the same plan becomes a plain
hash join on ``g`` — AQE-splittable.

Determinism/float discipline: integer counts and one boolean — no
floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

DECONTAM_N = 13


def word_ngrams(toks: Column, n: int) -> Column:
    """array<string> of the column's word n-grams (space-joined).
    ``sequence(1, stop)`` DESCENDS when stop < 1, so the end is
    clamped to 1 and a zero-length outer slice yields the empty array
    for too-short documents (the repetition-operator trick)."""
    n_grams = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.slice(grams, 1, F.greatest(n_grams, F.lit(0)))


def benchmark_ngrams(
    bench: DataFrame,
    n: int = DECONTAM_N,
    text_col: str = "text",
) -> DataFrame:
    """The DISTINCT word n-grams of the benchmark documents, one
    ``g`` string column — the (small) probe side of the overlap
    join."""
    return (
        bench.select(
            F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("g")
        )
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    bench_grams: DataFrame,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id, n_grams, n_hits, contaminated) per corpus document.

    ``bench_grams`` is the output of :func:`benchmark_ngrams` (a
    single distinct ``g`` column). ``broadcast_bench`` keeps the
    corpus side shuffle-free; disable it only if the benchmark set
    outgrows executor memory.

    Per-doc distinctness is an ``array_distinct`` BEFORE the explode
    (zero shuffle, and cross-doc gram duplicates are irrelevant to a
    per-doc count); the total is a plain projection so documents too
    short for any n-gram still emit a row with ``n_grams = 0``. The
    only corpus shuffle is the doc-keyed hit count."""
    grams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    bench_side = F.broadcast(bench_grams) if broadcast_bench else bench_grams
    hits = (
        grams.join(bench_side, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    totals = corpus.select(
        F.col(id_col),
        F.size(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n)))
        .cast("long")
        .alias("n_grams"),
    )
    return totals.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_grams",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy decontamination: flag corpus documents whose shingle
    Jaccard against ANY benchmark document reaches ``threshold`` —
    the near-duplicate complement to the exact 13-gram overlap
    (Llama-style eval-overlap removal catches paraphrased/reflowed
    benchmark copies that exact n-grams miss).

    Returns one row per corpus document: (id, n_bench_hits,
    max_jaccard, contaminated). ``max_jaccard`` is the maximum over
    the VERIFIED >=threshold hits (NULL when clean) — each Jaccard is
    one exact integer division and max over exact doubles is
    order-free, so the output is engine-reproducible.

    LSH guarantee: same banding as minhash_near_dup (64 hashes / 16
    bands); at the default 0.9 threshold a qualifying pair escapes
    every band with probability (1 - 0.9^4)^16 ~ 4e-8 over hash
    families. The md5 family is FIXED, so on a given corpus the
    outcome is deterministic — the oracle computes true all-pairs,
    and parity additionally rests on the verified data gap: no
    corpus/bench pair sits in [0.80, 0.9167) at any shipped sf dir,
    so the banding and the exact answer cannot disagree there. Do
    not lower the threshold materially below 0.9: the escape
    probability grows fast (at 0.5 it is ~0.35 per pair) and the
    oracle would no longer match.

    Scale shape: the benchmark side is an eval suite (bounded), so
    BOTH joins broadcast it — the corpus side's wide operations are
    the signature UDF scan and one doc-keyed agg; no self-join,
    no salting needed (broadcast joins cannot concentrate a hot band
    key on one reducer), and shingles are re-materialized only for
    the candidate subset (left_semi first). The candidate table is
    cached: it feeds the verification join plus both left_semi
    probes, and without the cache each consumer would recompute the
    corpus-wide signature UDF (the minhash_near_dup lesson,
    operators/dedup.py)."""
    from ..functions.textstats import jaccard, word_shingles_fast
    from .dedup import minhash_signatures

    # fan out a narrow input before the Arrow signature stage — a
    # single-file corpus is one split under the default 128 MB
    # maxPartitionBytes and would run the dominant UDF on one core
    # (same prep as minhash_near_dup)
    sc = corpus.sparkSession.sparkContext
    width = sc.defaultParallelism
    n_files = len(corpus.inputFiles())
    if (0 < n_files < width) or corpus.rdd.getNumPartitions() < width:
        corpus = corpus.repartition(width)
    csig = minhash_signatures(
        corpus, text_col, id_col, num_hashes, shingle_k, bands
    )
    bsig = minhash_signatures(
        bench, text_col, id_col, num_hashes, shingle_k, bands
    )
    cb = csig.select(
        F.col(id_col), F.posexplode("band_keys").alias("band", "key")
    )
    bb = bsig.select(
        F.col(id_col).alias("_bid"),
        F.posexplode("band_keys").alias("band", "key"),
    )
    cand = (
        cb.join(F.broadcast(bb), ["band", "key"])
        .select(id_col, "_bid")
        .distinct()
        .cache()
    )
    sh = word_shingles_fast(shingle_k)
    csh = corpus.join(
        cand.select(id_col).distinct(), id_col, "left_semi"
    ).select(F.col(id_col), sh(F.col(text_col)).alias("_sha"))
    bsh = bench.join(
        cand.select(F.col("_bid").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    ).select(F.col(id_col).alias("_bid"), sh(F.col(text_col)).alias("_shb"))
    verified = (
        cand.join(csh, id_col)
        .join(F.broadcast(bsh), "_bid")
        .select(
            F.col(id_col),
            jaccard(F.col("_sha"), F.col("_shb")).alias("_j"),
        )
        .where(F.col("_j") >= threshold)
    )
    hits = verified.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
        F.max("_j").alias("max_jaccard"),
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bench_hits"), F.lit(0).cast("long")).alias(
                "n_bench_hits"
            ),
            F.col("max_jaccard"),
            F.col("max_jaccard").isNotNull().alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (Bloom 1970): the fixed-memory form of the
# exact overlap check above. decontaminate() broadcasts the benchmark
# GRAM STRINGS — fine for one eval suite, but the broadcast grows with
# the benchmark set (13-gram strings are long). A Bloom filter caps
# the probe side at M_BITS bits forever: K md5-derived positions per
# gram, a gram "hits" iff all K positions are set. Deterministic
# (fixed md5 family — the DuckDB twin recomputes every position), and
# one-sided: exact hits are always bloom hits; the false-positive rate
# (1 - e^(-K*n/M))^K is the visible gap between the two hit counts.

BLOOM_M = 1 << 16  # bits
BLOOM_K = 4  # hash functions


def bloom_positions(gram: Column, k: int = BLOOM_K, m: int = BLOOM_M) -> Column:
    """array<bigint> of the gram's K bit positions — the same
    "row:value" md5 family as the Count-Min rows (sketches.py)."""
    from .sketches import cms_bucket

    return F.array(*[cms_bucket(gram, i, m) for i in range(k)])


def bloom_build(
    bench_grams: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """The filter's SET-BIT table: one ``p`` column of distinct
    positions. At most ``m`` rows (8 KiB of bits in a real bitset)
    no matter how many benchmark grams exist — always broadcastable,
    which is the whole point. Position tables from independent
    benchmark batches merge by plain distinct-union (bitwise OR)."""
    return (
        bench_grams.select(
            F.explode(bloom_positions(F.col("g"), k, m)).alias("p")
        )
        .distinct()
    )


def bloom_decontaminate(
    corpus: DataFrame,
    bench_grams: DataFrame,
    n: int = DECONTAM_N,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: distinct n-gram count, the EXACT benchmark
    hit count, and the Bloom hit count side by side —
    (id, n_grams, n_hits_exact, n_hits_bloom, contaminated_exact,
    contaminated_bloom). Bloom hits are a superset of exact hits by
    construction, so ``n_hits_bloom >= n_hits_exact`` always; at scale
    a pipeline keeps only the Bloom pass (fixed memory) and accepts
    the one-sided false-positive rate as extra discarded documents.

    Plan shape: the gram projection is narrow and recomputed per
    consumer (cheaper than caching a 13x-exploded corpus); the bloom
    probe joins a <= m-row broadcast and counts set positions per
    (doc, gram) — a doc-and-gram-keyed agg that no hot benchmark gram
    can skew (the broadcast join has no reducer key)."""
    grams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    exact = (
        grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits_exact"))
    )
    setbits = bloom_build(bench_grams, k, m)
    probe = grams.select(
        F.col(id_col),
        F.col("g"),
        F.explode(bloom_positions(F.col("g"), k, m)).alias("p"),
    )
    bloom = (
        probe.join(
            F.broadcast(setbits.withColumn("_set", F.lit(1))), "p", "left"
        )
        .groupBy(id_col, "g")
        # never emitted: grouping on g keeps position counts per gram
        .agg(F.count("_set").alias("_nset"))
        .where(F.col("_nset") == k)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits_bloom"))
    )
    totals = corpus.select(
        F.col(id_col),
        F.size(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n)))
        .cast("long")
        .alias("n_grams"),
    )
    return (
        totals.join(exact, id_col, "left")
        .join(bloom, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce(F.col("n_hits_exact"), F.lit(0))
            .cast("long")
            .alias("n_hits_exact"),
            F.coalesce(F.col("n_hits_bloom"), F.lit(0))
            .cast("long")
            .alias("n_hits_bloom"),
            (F.coalesce(F.col("n_hits_exact"), F.lit(0)) > 0).alias(
                "contaminated_exact"
            ),
            (F.coalesce(F.col("n_hits_bloom"), F.lit(0)) > 0).alias(
                "contaminated_bloom"
            ),
        )
    )


def containment_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.8,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment decontamination: flag a corpus document when it
    CONTAINS (shingle-containment >= threshold) any benchmark
    document —

        C(doc, bench) = |S(doc) ∩ S(bench)| / |S(bench)|

    the asymmetric complement to fuzzy_decontaminate's Jaccard: a
    short eval item quoted inside a long web page scores near-zero
    Jaccard (the page's size dominates the union) but containment ~1.
    Exact, no LSH: each containment is ONE division of exact integers
    and max over exact doubles is order-free, so the twin matches
    bit-for-bit with no banding argument needed.

    Scale shape: the benchmark side broadcasts through both the
    shingle join and the size join (bounded eval suite); the corpus
    explodes its distinct shingles once and aggregates on
    (doc, bench) then doc — no self-join, no skewable reducer key
    (the join side is broadcast). Returns (id, n_bench_hits,
    max_containment, contaminated); max_containment is NULL when no
    benchmark doc reaches the threshold."""
    from ..functions.textstats import word_shingles

    bsh = bench.select(
        F.col(id_col).alias("_bid"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g"),
    )
    bsz = bench.select(
        F.col(id_col).alias("_bid"),
        F.size(word_shingles(F.col(text_col), shingle_k)).alias("_bsz"),
    ).where(F.col("_bsz") > 0)
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g"),
    )
    cont = (
        grams.join(F.broadcast(bsh), "g")
        .groupBy(id_col, "_bid")
        .agg(F.count(F.lit(1)).alias("_inter"))
        .join(F.broadcast(bsz), "_bid")
        .select(
            F.col(id_col),
            (F.col("_inter").cast("double") / F.col("_bsz").cast("double")).alias(
                "_c"
            ),
        )
        .where(F.col("_c") >= threshold)
    )
    hits = cont.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
        F.max("_c").alias("max_containment"),
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bench_hits"), F.lit(0).cast("long")).alias(
                "n_bench_hits"
            ),
            F.col("max_containment"),
            F.col("max_containment").isNotNull().alias("contaminated"),
        )
    )

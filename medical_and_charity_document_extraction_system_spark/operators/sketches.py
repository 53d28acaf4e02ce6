"""Frequency/cardinality sketches: deterministic, engine-portable
HyperLogLog (distinct counts) and Count-Min (frequency estimates).

Distinct-counting at crawl scale (distinct urls per host, distinct
hosts per TLD, ...) can't afford exact countDistinct's shuffle of
every value; HyperLogLog (Flajolet et al. 2007) is the standard
sketch. This implementation follows the repo's determinism rules:

- the hash is md5-derived (same rationale as simhash, CLAUDE.md): the
  DuckDB oracle recomputes every register from scratch — no xxhash64,
  no RNG;
- register math is INTEGER through the harmonic sum: bucket = low 8
  bits of a 60-bit md5 prefix, w = the remaining 52-bit word
  (``h >> 8``), rho = 53 - bitlength(w) via ``length(bin(w))`` —
  both Spark and DuckDB print binary without leading zeros, so
  bitlength is exact in both;
- the harmonic sum 'sum of 2^-M_j' is kept EXACT by scaling: each
  register contributes the bigint ``1 << (53 - M_j)`` (max 2^52;
  256 registers keep the total under 2^61), absent/empty registers
  contribute ``1 << 53``. Integer sums are order-independent, so no
  float fold-order hazard exists anywhere;
- the single float step is the final division: (alpha_m * m^2 * 2^53,
  one Python-computed literal, exact power-of-two scaling) divided by
  the scaled sum cast to double (round-to-nearest of an exact int —
  identical in every engine).

The raw HLL estimate is emitted without the small-range
linear-counting correction (that needs ln, which is NOT correctly
rounded and breaks cross-engine bit-exactness — the same reason bm25
injects idf literals); ``n_empty`` is emitted so a consumer that
tolerates last-ulp drift can apply m*ln(m/V) itself.

Plan shape at 10^12 rows: one (key, bucket) hash-agg with map-side
max-combine — the shuffle carries at most m=256 rows per key — then
a per-key rollup of <= 256 rows. This is the whole point of the
sketch: the exact countDistinct twin shuffles every distinct VALUE;
HLL shuffles 256 small ints per key no matter how many values exist.
Register tables from disjoint corpora union by (key, bucket, max) —
sketch merge is the same agg, which is what makes it streamable and
incrementally maintainable (same pattern as the MinHash signature
store).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 8
M = 1 << P  # 256 registers
# alpha_m * m^2 * 2^53 for m=256 (Flajolet et al.), one literal shared
# with the SQL twin; the 2^53 factor is the exact harmonic-sum scaling
ALPHA_NUM = (0.7213 / (1.0 + 1.079 / M)) * M * M * float(1 << 53)


def _h60(value: Column) -> Column:
    """60-bit positive integer from the md5 hex prefix (15 nibbles —
    stays clear of the int64 sign bit)."""
    return F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = low 8 bits, rho =
    leading zeros of the remaining 52-bit word + 1 = 53 -
    bitlength(w); w = 0 (probability 2^-52) saturates at 53."""
    h = _h60(value)
    bucket = h % M
    w = F.shiftright(h, P)  # h is positive: arithmetic == logical
    rho = F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53))
    return bucket, rho.cast("int")


def hll_cardinality(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key HLL distinct estimate of ``value_col``. Returns
    (*key_cols, n_buckets, n_empty, hll_estimate): the raw HLL
    formula alpha*m^2 / sum(2^-M_j), absent registers contributing
    2^0, evaluated with an exact integer harmonic sum."""
    regs = hll_registers(df, key_cols, value_col)
    return hll_estimate_from_registers(regs, key_cols)


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """The per-key register table (*key_cols, bucket, mreg). Register
    tables MERGE by the same groupBy-max (max is associative and
    commutative), so sketches of disjoint batches union into the
    sketch of their union — the incremental/streaming form."""
    bucket, rho = hll_register_cols(F.col(value_col))
    return (
        df.select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("mreg"))
    )


def merge_hll_registers(*regs: DataFrame) -> DataFrame:
    """Union register tables from independent batches into one —
    groupBy max over the same (keys, bucket)."""
    u = regs[0]
    for r in regs[1:]:
        u = u.unionByName(r)
    keys = [c for c in u.columns if c not in ("bucket", "mreg")]
    return u.groupBy(*keys, "bucket").agg(F.max("mreg").alias("mreg"))


def hll_estimate_from_registers(
    regs: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Finish a register table into (keys, n_buckets, n_empty,
    hll_estimate) — shared by the one-shot and incremental forms."""
    # scaled 2^-M_j: bigint 1 << (53 - M_j); exact and order-free.
    # (expr form: F.shiftleft's bit count must be a Python int)
    scaled = F.expr("shiftleft(CAST(1 AS BIGINT), 53 - mreg)")
    per_key = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(scaled).alias("_s"),
    )
    total = F.col("_s") + (F.lit(M) - F.col("n_buckets")) * F.lit(1 << 53).cast(
        "bigint"
    )
    return per_key.select(
        *key_cols,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        (F.lit(M) - F.col("n_buckets")).cast("long").alias("n_empty"),
        (F.lit(ALPHA_NUM) / total.cast("double")).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): frequency estimates
# in fixed memory. Exact term counting over a 10^12-document corpus
# shuffles every distinct term; the CMS shuffles at most D*W integer
# cells no matter how large the vocabulary grows, and cells from
# disjoint corpora/partitions MERGE by plain addition — the same
# mergeability story as the HLL registers above, which is what makes
# it streamable and map-side combinable. Estimates are biased UP only
# (collisions add, never subtract): estimate >= true count always.
#
# Determinism: the D hash rows are md5-derived ("row:term" prefix
# trick — same rationale as simhash/HLL: the DuckDB twin recomputes
# every cell from scratch), all cell math is 64-bit integer, and the
# probe is min() over D exact integers — no float anywhere.

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row


def cms_bucket(term: Column, row: int, width: int = CMS_W) -> Column:
    """Row-``row``'s bucket for ``term``: md5("row:term") first 15
    nibbles (60 bits, clear of the int64 sign) mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), term)), 1, 15), 16, 10
    ).cast("bigint")
    return h % width


def cms_registers(
    term_counts: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    d: int = CMS_D,
    width: int = CMS_W,
) -> DataFrame:
    """Build the (row, bucket, cell) sketch table from a (term, count)
    stream. Addition commutes, so feeding pre-aggregated counts or raw
    occurrence rows (count 1) yields the identical sketch; the groupBy
    is map-side combinable and the shuffle carries at most d*width
    rows regardless of vocabulary size."""
    t, c = F.col(term_col), F.col(count_col)
    fanout = term_counts.select(
        c.alias("_c"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        cms_bucket(t, r, width).alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_rb"),
    )
    return (
        fanout.select("_rb.row", "_rb.bucket", "_c")
        .groupBy("row", "bucket")
        .agg(F.sum("_c").cast("long").alias("cell"))
    )


def merge_cms_registers(*regs: DataFrame) -> DataFrame:
    """Union sketch tables from independent batches — groupBy SUM over
    (row, bucket); the CMS merge operator."""
    u = regs[0]
    for r in regs[1:]:
        u = u.unionByName(r)
    return u.groupBy("row", "bucket").agg(F.sum("cell").alias("cell"))


def cms_estimate(
    registers: DataFrame,
    probes: DataFrame,
    term_col: str = "term",
    d: int = CMS_D,
    width: int = CMS_W,
) -> DataFrame:
    """Point-query the sketch: per probe term, min over the D row
    cells. Probe terms absent from every build row would miss the
    join; a left join + zero-coalesce keeps never-seen terms exact
    (estimate 0). The registers side is at most d*width rows —
    broadcast it so probing never shuffles the probe side."""
    probe_rb = probes.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        cms_bucket(F.col(term_col), r, width).alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_rb"),
    ).select(term_col, "_rb.row", "_rb.bucket")
    return (
        probe_rb.join(F.broadcast(registers), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0).cast("long"))).alias(
                "cms_estimate"
            )
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles: the mergeable-quantile member of the
# sketch family (HLL = distinct, CMS = frequency, Bloom = membership,
# histogram = rank/quantile). The exact discrete quantile
# (host_length_quantiles) row-numbers every value inside a corpus-
# sized window partition; the histogram shuffles at most BINS integer
# cells per key, merges by addition (streamable, map-side
# combinable), and answers any quantile with error bounded by one bin
# width. Everything is integer — bin assignment is one integer
# division, the rank threshold ceil(q*n) is computed as
# (n*pct + 99) div 100, exact in both engines with NO float literal
# at all (sidestepping the DuckDB DECIMAL-0.95 trap entirely).

HIST_BINS = 64
HIST_WIDTH = 16  # covers values 0 .. BINS*WIDTH-1; last bin absorbs overflow


def hist_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bins: int = HIST_BINS,
    width: int = HIST_WIDTH,
) -> DataFrame:
    """(keys, bin, cnt) — mergeable by groupBy-SUM, like the CMS
    cells. Negative values clamp to bin 0, overflow to the last bin."""
    bin_expr = F.expr(
        f"least(greatest({value_col}, 0) div {width}, {bins - 1})"
    ).cast("int")
    return (
        df.select(*key_cols, bin_expr.alias("bin"))
        .groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_quantiles(
    regs: DataFrame,
    key_cols: list[str],
    pcts: tuple[int, ...] = (50, 95),
    width: int = HIST_WIDTH,
) -> DataFrame:
    """Finish a register table into per-key quantile estimates:
    for each percentile p, the smallest bin whose cumulative count
    reaches ceil(p% of n), reported as (p{p}_bin, p{p}_upper) where
    upper = (bin+1)*width - 1 bounds the true discrete quantile from
    above (and bin*width from below: one-bin-width error, always).

    The cumulative window partitions on the KEY over the aggregated
    register table — at most BINS rows per partition regardless of
    corpus size, so this is NOT the inverted_index window hazard
    (that window partitioned a corpus-sized posting list)."""
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*key_cols)
    cum = regs.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    aggs = [F.max("n").cast("long").alias("n_docs")]
    for p in pcts:
        thr = F.expr(f"(n * {p} + 99) div 100")
        qbin = F.min(F.when(F.col("cum") >= thr, F.col("bin")))
        aggs.append(qbin.cast("long").alias(f"p{p}_bin"))
        aggs.append(
            ((qbin + 1) * width - 1).cast("long").alias(f"p{p}_upper")
        )
    return cum.groupBy(*key_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# AMS F2 (second frequency moment) sketch — Alon, Matias & Szegedy 1996.
#
# F2 = sum over distinct items of count(item)^2 measures the skew of a
# frequency distribution (join-size estimation, self-join cardinality,
# repetitiveness of a token stream). Exact F2 needs the full per-item
# count table; the AMS "tug-of-war" sketch keeps R integer registers:
# register r accumulates sum(count(x) * sign_r(x)) where sign_r is a
# ±1 hash, and E[register^2] = F2.
#
# Determinism and portability follow the HLL/CMS rules: the sign is
# the parity of one md5 nibble of "r:term" (the DuckDB twin recomputes
# it from scratch), every register is an int64 SUM (order-free,
# map-side combinable, merges across batches by plain addition), the
# estimate is sum(register^2) floor-divided by R — no float anywhere,
# in either engine. Register values are O(sqrt(F2)); their squares
# need headroom, so at extreme corpus scale shard the stream by a
# term-hash prefix and sum the per-shard F2s (F2 is additive across
# disjoint item sets).

AMS_R = 64  # registers


def ams_sign(term: Column, r: int) -> Column:
    """±1 from the parity of the first md5 nibble of "r:term"."""
    nib = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{r}:"), term)), 1, 1), 16, 10
    ).cast("bigint")
    return (nib % 2) * 2 - 1


def ams_registers(
    term_counts: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    r: int = AMS_R,
) -> DataFrame:
    """Build the R-register tug-of-war table from a (term, count)
    stream. Addition commutes: raw occurrence rows (count 1) and
    pre-aggregated counts produce the identical sketch, and register
    tables from disjoint batches merge by summation
    (``merge_ams_registers``). The fan-out is R rows per DISTINCT
    term — aggregate to term counts first, never explode the raw
    token stream R ways."""
    t, c = F.col(term_col), F.col(count_col)
    fanout = term_counts.select(
        c.alias("_c"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("r"),
                        (ams_sign(t, i) * c).alias("signed"),
                    )
                    for i in range(r)
                ]
            )
        ).alias("_rs"),
    )
    return (
        fanout.select("_rs.r", "_rs.signed")
        .groupBy("r")
        .agg(F.sum("signed").cast("long").alias("reg"))
    )


def merge_ams_registers(*regs: DataFrame) -> DataFrame:
    """Union register tables from independent batches — groupBy SUM
    per register; the AMS merge operator (signed sums commute)."""
    u = regs[0]
    for x in regs[1:]:
        u = u.unionByName(x)
    return u.groupBy("r").agg(F.sum("reg").cast("long").alias("reg"))


def ams_f2_report(
    registers: DataFrame, term_counts: DataFrame, count_col: str = "cnt"
) -> DataFrame:
    """One-row summary: the sketch estimate (mean of squared registers
    as ONE integer floor division) next to the exact F2, with the
    error in integer basis points. The register table is <= R rows —
    both aggregates are driver-trivial; exact F2 reuses the term-count
    table the registers were built from (one extra map-side agg)."""
    c = F.col(count_col)
    est = registers.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.expr("sum(reg * reg) div count(*)").cast("long").alias("f2_estimate"),
    )
    exact = term_counts.agg(F.sum(c * c).cast("long").alias("f2_exact"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "n_registers",
            "f2_exact",
            "f2_estimate",
            F.expr(
                "abs(f2_estimate - f2_exact) * 10000 div greatest(f2_exact, 1)"
            )
            .cast("long")
            .alias("err_bp"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — Bar-Yossef 2002,
# Beyer et al. 2007.
#
# Keep the k smallest md5-derived hashes of a set. Unlike HLL, the
# KMV sketch supports INTERSECTION estimates: the bottom-k of a union
# is computable from two sketches alone (bottom-k(A ∪ B) ⊆ kA ∪ kB),
# and the fraction of those union hashes present in BOTH input
# sketches estimates the Jaccard. Everything is integer: hashes are
# the first 13 md5 hex digits (52 bits — wide enough that collisions
# are negligible, narrow enough that (k-1) * 2^52 stays inside int64
# in BOTH engines; recomputable from scratch in DuckDB), the
# estimator is (k-1) * 2^52 DIV kth_min, and a group
# with fewer than k distinct items reports its EXACT count (the
# sketch holds the whole set). Selection reuses grouped_topk — never
# a window over raw rows.

KMV_K = 128
KMV_SPACE = 1 << 52


def kmv_hash(col: Column) -> Column:
    """52-bit positive integer from the first 13 md5 hex digits."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame, key_col: str, item_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-key bottom-k distinct item hashes: (key, kmv_hash) rows.
    The distinct is a map-side-combinable hash-agg; selection is the
    grouped_topk agg+join rule (score = -hash), so a mega-key never
    funnels through one window task."""
    from .topk import grouped_topk

    hashes = (
        df.select(
            F.col(key_col).alias("kmv_key"),
            kmv_hash(F.col(item_col)).alias("kmv_hash"),
        )
        .distinct()
        .withColumn("_neg", -F.col("kmv_hash"))
    )
    return grouped_topk(hashes, "kmv_key", "_neg", "kmv_hash", k).select(
        "kmv_key", "kmv_hash"
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(key, n_kept, est): (k-1) * 2^52 DIV kth_min when the sketch is
    full, the exact member count when the whole set fit."""
    agg = sketch.groupBy("kmv_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("kmv_hash").alias("kth"),
    )
    return agg.select(
        "kmv_key",
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST({k - 1} AS BIGINT) * {KMV_SPACE} div kth")
        )
        .cast("long")
        .alias("est"),
    )


def kmv_pair_overlap(
    sketch: DataFrame, key_a: str, key_b: str, k: int = KMV_K
) -> DataFrame:
    """Union/intersection estimates for one key pair from the two
    sketches ALONE (the set-operation property HLL lacks): the union
    sketch is the bottom-k of the two hash sets' union; hashes in it
    that appear in BOTH input sketches estimate the intersection as
    n_both * est_union DIV n_union_kept. When the union fits under k
    every figure is exact by construction. One row out."""
    from .topk import grouped_topk

    a = sketch.where(F.col("kmv_key") == key_a).select("kmv_hash")
    b = sketch.where(F.col("kmv_key") == key_b).select("kmv_hash")
    u = (
        a.unionByName(b)
        .distinct()
        .select(F.lit("u").alias("kmv_key"), "kmv_hash")
        .withColumn("_neg", -F.col("kmv_hash"))
    )
    uk = grouped_topk(u, "kmv_key", "_neg", "kmv_hash", k).select("kmv_hash")
    both = uk.join(a, "kmv_hash", "left_semi").join(b, "kmv_hash", "left_semi")
    stats = uk.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.max("kmv_hash").alias("kth"),
    ).crossJoin(
        F.broadcast(both.agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    )
    return stats.select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        "n_union_kept",
        "n_both",
        F.when(F.col("n_union_kept") < k, F.col("n_union_kept"))
        .otherwise(
            F.expr(f"CAST({k - 1} AS BIGINT) * {KMV_SPACE} div kth")
        )
        .cast("long")
        .alias("est_union"),
    ).withColumn(
        "est_intersection",
        F.expr("n_both * est_union div n_union_kept").cast("long"),
    )


def kmv_pairs_overlap(
    sketch: DataFrame,
    pairs: list[tuple[str, str]],
    k: int = KMV_K,
) -> DataFrame:
    """``kmv_pair_overlap`` for MANY pairs in ONE plan: the pair list
    broadcasts, both sides' sketch rows tag themselves with their
    pair via two equi-joins (never an OR-join), the per-pair union
    bottom-k goes through one grouped_topk over the concatenated pair
    key, and membership flags ride left joins off the same tagged
    slices. Identical output rows to N single-pair calls, one job
    instead of 3N tiny stages."""
    spark = sketch.sparkSession
    pdf = F.broadcast(
        spark.createDataFrame(list(pairs), "key_a string, key_b string")
    )
    a_side = pdf.join(
        sketch, sketch["kmv_key"] == F.col("key_a")
    ).select("key_a", "key_b", "kmv_hash")
    b_side = pdf.join(
        sketch, sketch["kmv_key"] == F.col("key_b")
    ).select("key_a", "key_b", "kmv_hash")
    u = (
        a_side.unionByName(b_side)
        .distinct()
        .withColumn(
            "_pair", F.concat_ws("|", F.col("key_a"), F.col("key_b"))
        )
        .withColumn("_neg", -F.col("kmv_hash"))
    )
    from .topk import grouped_topk

    uk = grouped_topk(u, "_pair", "_neg", "kmv_hash", k).select(
        "key_a", "key_b", "kmv_hash"
    )
    am = a_side.withColumn("_ina", F.lit(1))
    bm = b_side.withColumn("_inb", F.lit(1))
    per = (
        uk.join(am, ["key_a", "key_b", "kmv_hash"], "left")
        .join(bm, ["key_a", "key_b", "kmv_hash"], "left")
        .groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_kept"),
            F.max("kmv_hash").alias("kth"),
            F.sum(
                F.when(
                    F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
        )
    )
    return per.select(
        "key_a",
        "key_b",
        "n_union_kept",
        "n_both",
        F.when(F.col("n_union_kept") < k, F.col("n_union_kept"))
        .otherwise(F.expr(f"CAST({k - 1} AS BIGINT) * {KMV_SPACE} div kth"))
        .cast("long")
        .alias("est_union"),
    ).withColumn(
        "est_intersection",
        F.expr("n_both * est_union div n_union_kept").cast("long"),
    )

"""Deduplication operators for web-scale training-data pipelines.

Not present in the reference (single-document service) but a
first-class requirement for the 10^12-page target. All variants are
DataFrame-native:

- ``exact_dedup``     — md5 hash-groupBy, keep min key (1 shuffle)
- ``minhash_near_dup``— word-shingle MinHash signatures (JVM-side
  xxhash64, no Python), banded LSH bucketing, bucket-join candidate
  generation, exact-Jaccard verification. The standard
  shingle->minhash->band->bucket-join pipeline: shuffle cost is
  O(bands x docs) small rows, never all-pairs.
- ``simhash64``       — 64-bit SimHash; token hashes computed JVM-side,
  bit-voting in a vectorized Arrow pandas_udf (numpy); Hamming
  near-dup via 16-bit chunk blocking + ``bit_count(a ^ b)``.
- ``embedding_near_dup`` lives in operators/similarity.py (shares the
  random-hyperplane LSH machinery).

Scale notes: candidate pairs are generated per-band and deduplicated
*before* verification; verification joins shingle sets back by id
(broadcastable when the candidate set is small, shuffle-join
otherwise — AQE decides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textstats import jaccard, tokens, word_shingles

MINHASH_SEED = 42


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text; keeps the smallest id (deterministic)."""
    fp = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fp")
    keep = df.groupBy(fp).agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def minhash_signature(sh: Column, num_hashes: int = 64) -> Column:
    """MinHash signature of a shingle array: for seed i, min over
    shingles of xxhash64(shingle, seed, i). Pure JVM expressions."""
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda x: F.xxhash64(x, F.lit(MINHASH_SEED), F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    sh = word_shingles(F.col(text_col), shingle_k)
    return df.select(
        F.col(id_col),
        sh.alias("shingles"),
        minhash_signature(sh, num_hashes).alias("signature"),
    ).where(F.size("shingles") > 0)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: hash each band of the signature; docs sharing any
    band bucket become a candidate pair. Returns distinct (id_a, id_b),
    id_a < id_b."""
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice("signature", b * rows_per_band + 1, rows_per_band)).alias("h"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig_df.select(F.col(id_col), F.explode(band_keys).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.h").alias("h")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    return pairs.distinct()


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with exact-Jaccard verification >= threshold.

    With 64 hashes / 16 bands of 4 rows, a pair at j=0.9 is caught with
    probability 1-(1-0.9^4)^16 ~ 1-1e-12; false positives are removed
    by the verification join.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).cache()
    cands = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    verified = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .select(
            "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# ------------------------------------------------------------- SimHash
@F.pandas_udf(T.LongType())
def _simhash_from_hashes(hash_arrays: pd.Series) -> pd.Series:
    """Bit-vote 64-bit SimHash from per-token xxhash64 values.
    Vectorized with numpy over the Arrow batch."""
    out = np.zeros(len(hash_arrays), dtype=np.int64)
    for i, hs in enumerate(hash_arrays):
        if hs is None or len(hs) == 0:
            continue
        arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(arr)  # +1 per set bit, -1 per unset
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = sim.astype(np.int64)
    return pd.Series(out)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document. Token hashing stays JVM-side
    (xxhash64 in a transform); only the bit-voting crosses to Python,
    as int64 arrays through Arrow."""
    token_hashes = F.transform(
        tokens(F.col(text_col)), lambda x: F.xxhash64(x, F.lit(MINHASH_SEED))
    )
    return df.select(
        F.col(id_col), _simhash_from_hashes(token_hashes).alias("simhash")
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit hash into 4 x 16-bit chunks; any pair
    within Hamming<=3 shares at least one identical chunk (pigeonhole),
    so candidates = equality-join per chunk — never all-pairs.
    """
    sims = simhash64(df, text_col, id_col)
    chunks = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for a given candidate-pair set (id_a, id_b)."""
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("sh"))
    return (
        candidate_pairs.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
        )
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )

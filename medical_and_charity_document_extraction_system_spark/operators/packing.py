"""Sequence packing: map documents to fixed-length training windows.

A pretraining data loader concatenates each shard's documents in a
fixed order and slices the token stream into ``seq_len``-token
training sequences (documents cross sequence boundaries — the
GPT-style packing). This operator computes, per document, WHERE in
that stream it lands, so a trainer (or an audit job) can address any
document's tokens without materializing the stream:

- shard/order: the same md5-bucket shard assignment and
  (md5(id), id) intra-shard order as operators/mixing.py — the
  packing is a pure function of the corpus, byte-stable across
  reruns and repartitionings;
- ``tok_start``  — tokens preceding the document within its shard
  (an integer running sum);
- ``seq_first``  — index of the training sequence the document
  starts in (tok_start DIV seq_len);
- ``seq_offset`` — position within that sequence (tok_start MOD
  seq_len);
- ``n_seqs``     — how many sequences the document touches
  (0 for an empty document).

All integer arithmetic — exact in any engine. Scale shape: one
window per shard; shards are BOUNDED by construction (a fixed
document/byte budget per shard at export time), so the window
partition never grows with the corpus — the same argument as
shard_assignments/shard_export. No floats, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count
from .mixing import _order_hash
from .sampling import _hash_mod


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, tok_start, seq_first, seq_offset,
    n_seqs) for every document."""
    base = df.select(
        F.col(id_col),
        (_hash_mod(F.col(id_col), 10000) % n_shards).alias("shard"),
        _order_hash(F.col(id_col)).alias("_oh"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_oh", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = base.select(
        F.col(id_col),
        F.col("shard"),
        F.col("n_tokens"),
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("long")
        .alias("tok_start"),
    )
    seq_first = F.expr(f"tok_start DIV {seq_len}")
    return c.select(
        F.col(id_col),
        F.col("shard"),
        F.col("n_tokens"),
        F.col("tok_start"),
        seq_first.alias("seq_first"),
        (F.col("tok_start") % seq_len).alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"(tok_start + n_tokens - 1) DIV {seq_len}")
            - seq_first
            + 1
        )
        .alias("n_seqs"),
    )

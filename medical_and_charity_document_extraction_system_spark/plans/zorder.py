"""Z-order (Morton curve) clustering for multi-dimension data skipping.

Partition pruning (plans/bucketing.py, the IVF layout) skips on ONE
key. A crawl table is queried by host AND by time; sorting by either
leaves the other scattered across every file. Z-ordering interleaves
the bits of both dimensions and sorts by the interleaved value, so
consecutive rows are close in BOTH dimensions — every data file then
covers a narrow min/max range of each column, and parquet row-group /
file statistics prune scans filtered on either one (the same layout
trick Delta/Iceberg expose as OPTIMIZE ZORDER BY).

The curve is pure integer bit-twiddling (the classic magic-number
spread), identical in Spark and DuckDB, so the z-value itself sits
under the bit-exact oracle gate; the LAYOUT property (per-file span
of each dimension shrinks vs. an unsorted write) is pinned by pytest
reading parquet footer statistics.

At 10^12 rows: ``write_zordered`` is one range-partitioned sort on
the z-value — the normal price of clustering a table at rest, paid
once per compaction cycle, amortized over every pruned scan after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """16-bit int -> its bits at the even positions of a 32-bit int."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(x: Column, y: Column) -> Column:
    """Morton interleave of two unsigned 16-bit column values:
    z's even bits are x's, odd bits are y's. Bigint, order-preserving
    along the curve."""
    return (
        _spread16(x.cast("bigint"))
        .bitwiseOR(F.shiftleft(_spread16(y.cast("bigint")), 1))
        .cast("bigint")
    )


def zorder_sql_expr(x: str, y: str) -> str:
    """The identical curve as a DuckDB/ANSI expression (shares the
    magic masks with _spread16 by construction)."""

    def spread(col: str) -> str:
        e = f"({col} & 65535)"
        for shift, mask in _SPREAD:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
) -> None:
    """Cluster ``df`` along the (x, y) Morton curve and write
    ``n_files`` parquet files, each covering one contiguous z-range
    (repartitionByRange + in-partition sort): file min/max stats on
    BOTH x and y become tight, so filters on either prune."""
    z = zvalue(F.col(x_col), F.col(y_col)).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

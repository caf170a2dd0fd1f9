"""Data-layout operators: Z-order (Morton) clustering keys.

Parquet prunes row groups by min/max statistics; sorting by ONE column
gives perfect pruning on that column and none on others.  Interleaving the
bits of two (rank-normalized) columns into a Morton key and sorting by it
gives good pruning on BOTH — the idea behind lakehouse ``OPTIMIZE ZORDER``.
Here it's a pure column expression + a layout writer, usable on plain
parquet.

The key is built JVM-side from bit arithmetic (no UDF); rank
normalization uses ntile so skewed value distributions still spread
across the key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension → 32-bit Morton key


def _spread_bits(c: Column) -> Column:
    """Insert a zero between every bit of a 16-bit value (classic Morton
    spreading, expressed as shift/mask column arithmetic)."""
    x = c.cast("long")
    # NB: Column `|` is boolean OR in PySpark — bitwise needs .bitwiseOR
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a_bucket: Column, b_bucket: Column) -> Column:
    """Interleave two <=16-bit bucket ids into one Morton key."""
    return _spread_bits(a_bucket).bitwiseOR(
        F.shiftleft(_spread_bits(b_bucket), 1)
    ).alias("zkey")


def with_zorder_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Append a ``zkey`` column: rank-normalize both dimensions to 2^16
    buckets (ntile over a global order — one sort each at layout time,
    amortized over every future read), then interleave."""
    n = 1 << ZBITS
    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    return df.withColumn(
        "zkey",
        morton_key(F.ntile(n).over(wa) - 1, F.ntile(n).over(wb) - 1),
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 32
) -> None:
    """Write parquet clustered by the Morton key of (col_a, col_b):
    repartitionByRange on zkey → each output file covers a compact
    rectangle of the 2-D value space → min/max stats prune on either
    dimension."""
    keyed = with_zorder_key(df, col_a, col_b)
    keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey").drop(
        "zkey"
    ).write.mode("overwrite").parquet(path)

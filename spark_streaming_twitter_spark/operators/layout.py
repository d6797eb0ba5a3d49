"""Space-filling-curve data layout: Morton (Z-order) clustering.

The multi-dimensional-pruning lever the storage-layout family
(tests/test_storage_layout.py: bucketing, partition pruning) didn't cover:
a single sort/partition key can prune file scans on ONE column only, but
interleaving the bits of two normalized keys (the Morton code) gives every
contiguous z-range a bounded rectangle in BOTH dimensions — so min/max
footer stats prune files for predicates on either column or both. This is
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` (public
feature of both formats), expressed here with nothing but exact BIGINT
bit arithmetic that Catalyst folds into the scan projection.

The bit-spread is the classic magic-number interleave (public-domain
"Bit Twiddling Hacks" technique): four mask-and-shift rounds spread a
16-bit value over 32 even bit positions; two spread values OR'd with a
1-bit offset give the 32-bit Morton code. Every step is exact integer
arithmetic, so the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.registry import query

# magic masks for the 16-bit -> 32-bit even-position bit spread
_M = (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
_SHIFTS = (8, 4, 2, 1)


def spread16(c: Column) -> Column:
    """Spread a 16-bit BIGINT value over the even bit positions of 32."""
    for shift, mask in zip(_SHIFTS, _M):
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton2(x: Column, y: Column) -> Column:
    """32-bit Morton code: x on even bits, y on odd bits."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def _spread_sql(expr: str) -> str:
    for shift, mask in zip(_SHIFTS, _M):
        expr = f"(({expr}) | (({expr}) << {shift})) & {mask}"
    return expr


def morton2_sql(x: str, y: str) -> str:
    """DuckDB twin of :func:`morton2` (same masks, same shifts)."""
    return f"({_spread_sql(x)}) | (({_spread_sql(y)}) << 1)"


@query(
    "part_zorder_cells",
    oracle=f"""
WITH z AS (
  SELECT p_partkey, p_size, p_retailprice,
         {morton2_sql(
             "CAST(p_size AS BIGINT) * 1310",
             "(CAST(floor(p_retailprice) AS BIGINT) - 900) * 655",
         )} AS zval
  FROM part
)
SELECT zval >> 28 AS z_cell,
       count(*) AS n_rows,
       min(p_size) AS min_size, max(p_size) AS max_size,
       CAST(floor(min(p_retailprice)) AS BIGINT) AS min_price_fl,
       CAST(floor(max(p_retailprice)) AS BIGINT) AS max_price_fl,
       min(zval) AS zmin, max(zval) AS zmax
FROM z GROUP BY 1
""",
    doc="Z-order (Morton) clustering cells over part(p_size, "
    "p_retailprice): both keys normalize to 16 bits by exact integer "
    "scaling, interleave via the magic-number bit spread, and the top 4 "
    "Morton bits name the layout cell — a row-LOCAL computation (no "
    "window, no global sort; at scale the file cut is "
    "repartitionByRange(zval) or partitionBy(z_cell), and "
    "tests/test_storage_layout.py measures the real footer-stats pruning "
    "win on written parquet). The per-cell min/max of BOTH dimensions is "
    "the point: each z-cell is a bounded rectangle in (size, price) "
    "space, so a two-column box predicate prunes to the few cells whose "
    "rectangles intersect it, where a single-column sort bounds only one "
    "dimension. The oracle replays the identical bit arithmetic — the "
    "Morton code is exact BIGINT on both engines.",
)
def part_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    x = F.col("p_size").cast("bigint") * F.lit(1310)
    y = (
        F.floor(F.col("p_retailprice")).cast("bigint") - F.lit(900)
    ) * F.lit(655)
    z = part.withColumn("zval", morton2(x, y))
    return (
        z.groupBy(F.shiftright(F.col("zval"), 28).alias("z_cell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.floor(F.min("p_retailprice")).cast("bigint").alias("min_price_fl"),
            F.floor(F.max("p_retailprice")).cast("bigint").alias("max_price_fl"),
            F.min("zval").alias("zmin"),
            F.max("zval").alias("zmax"),
        )
    )

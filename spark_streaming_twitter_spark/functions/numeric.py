"""Cross-engine-exact numeric aggregation helpers.

Distributed double sums are order-dependent in the last ulp, so a Spark
``sum(double)`` and a DuckDB ``sum(double)`` over the same rows can differ
bitwise — which breaks the driver's value-hash oracle compare. The fix is
exact arithmetic at the aggregation boundary:

    cast each element to DECIMAL(18,6)  →  exact, order-independent SUM
    →  cast the result back to DOUBLE   →  bitwise-identical on both engines

Scalar double expressions (a single product, a division) are IEEE-754
deterministic and need no special handling; only multi-row reductions do.
These helpers are also the right call at 100 TB: decimal partial aggregates
are fixed-width, merge exactly, and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column, emitted as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """avg = exact-sum / count — deterministic double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))


def dsum_sql(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{dsum_sql(expr)} / count(*)"

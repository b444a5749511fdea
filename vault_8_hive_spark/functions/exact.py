"""Cross-engine exactness helpers.

Floating-point aggregation order differs between Spark (partial aggs per
partition, AQE-dependent merge order) and any oracle engine, so a double
SUM over ~1e5 rows can differ in the last few ulps — enough to break a
value-hash comparison. The fix is to make the arithmetic order-independent:

- cast inputs to exact DECIMAL before summing (decimal addition is
  associative), then cast the final result to double — both engines round
  the same decimal to the same nearest double;
- derive averages/ratios as double divisions of those exact sums, which is
  a single deterministic IEEE op on identical inputs.

The same casts are mirrored in the oracle SQL (`DEC`/`MONEY_SUM` snippets
below) so both plans compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal shapes chosen to fit the testdata domains without overflow:
# prices < 1e7 (scale 2 on disk), discounts/tax in [0,1) with 2-3 decimals.
PRICE_DEC = "decimal(18,4)"
FRAC_DEC = "decimal(8,6)"
QTY_DEC = "decimal(18,4)"


def dec(col: Column | str, typ: str = PRICE_DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def exact_sum(col: Column | str, typ: str = PRICE_DEC) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return round4(F.sum(dec(col, typ)))


def round4(summed: Column) -> Column:
    """Decimal -> double, deterministically across engines.

    A high-scale decimal's unscaled int128 exceeds 2^53, so decimal->double
    conversion itself rounds — and Spark and DuckDB round differently in the
    last ulp. Rounding the exact decimal to scale 4 first (both engines
    round half-away-from-zero on decimals) keeps the unscaled value inside
    2^53, making the final double conversion exact and identical.
    """
    return F.round(summed, 4).cast("double")


def exact_avg(col: Column | str, typ: str = PRICE_DEC) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


# --- oracle-side (DuckDB SQL) mirrors -------------------------------------
# Use with str.format: MONEY_SUM.format(expr="l_extendedprice")

# 28 (not 18): DuckDB multiplies narrow decimals in int64 and can overflow
# at runtime; precision >=19 forces the int128 path with identical values.
ORACLE_PRICE_DEC = "DECIMAL(28,4)"
ORACLE_FRAC_DEC = "DECIMAL(8,6)"


def o_dec(expr: str, typ: str = ORACLE_PRICE_DEC) -> str:
    return f"CAST({expr} AS {typ})"


def o_exact_sum(expr: str, typ: str = ORACLE_PRICE_DEC) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS {typ})), 4) AS DOUBLE)"


def o_round4(sum_expr: str) -> str:
    return f"CAST(ROUND({sum_expr}, 4) AS DOUBLE)"


def o_exact_avg(expr: str, typ: str = ORACLE_PRICE_DEC) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr})"

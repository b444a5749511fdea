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
    # finite-measure contract: see scaled_long — an ANSI decimal cast of
    # NaN/Inf aborts the job (and 1e150 overflows DECIMAL(18,4));
    # both spellings treat an out-of-domain measure as NULL instead.
    return F.when(~F.isnan(c) & (F.abs(c) < F.lit(1e12)), c).cast(typ)


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


# --- scaled-long fast path -------------------------------------------------
# The decimal aggregation above is order-independent but runs on Spark's
# BigDecimal-backed Sum buffers — measured ~0.8s extra per 600k-row
# aggregate vs long sums (sf0.1, local[32]). When inputs are fixed-point
# with a known digit count (TPC-H money/frac columns are exactly 2-decimal;
# verified max |x*100 - round(x*100)| < 1e-9 on the driver data), the same
# exact value is computable on scaled int64: sum the scaled integers (long
# Sum stays in whole-stage codegen), then convert the handful of output
# rows back through decimal. Overflow bound: the widest product
# (price*100 <= 1.05e7) * (100-disc100) * (100+tax100) <= 1.2e11 per row,
# so an int64 global sum is safe to ~7.6e7 input rows — far past the bench
# SFs. At cluster scale (sf >= ~100) switch those aggregates back to
# `exact_sum`/`dec` (same value, ~2x agg-stage CPU); the helpers keep both
# spellings side by side for that reason.


def scaled_long(col: Column | str, digits: int = 2) -> Column:
    """Money/frac double column -> exact scaled int64 (x * 10^digits).

    floor(x*10^d + 0.5) instead of ROUND: Spark's ROUND on DoubleType goes
    through BigDecimal per row even inside codegen, which is most of the
    aggregate's CPU; floor(+0.5) is a fused double op and is exact here
    because inputs are fixed-point values whose double representation error
    (<1e-9 abs) can't cross the .5 boundary. A true F.floor (not a long
    cast, which truncates toward zero) keeps negatives exact too:
    floor(-1.00*100 + 0.5) = -100, where a cast would yield -99.
    """
    c = F.col(col) if isinstance(col, str) else col
    # TOTAL under ANSI for out-of-contract measures (extremes sweep,
    # round 7): floor(NaN/Inf) survives the multiply but the long cast
    # ABORTS the job, a finite-but-huge value (1e150) overflows the
    # scaled int64, and DuckDB's decimal cast errors both ways — so both
    # spellings treat a measure outside the money domain (non-finite or
    # |x| >= 1e12) as NULL: excluded from sums like SQL NULL, the
    # documented finite-measure contract.
    ok = ~F.isnan(c) & (F.abs(c) < F.lit(1e12))
    return F.floor(
        F.when(ok, c) * (10**digits) + F.lit(0.5)
    ).cast("long")


def _unscale_dec(sum_long: Column, digits: int) -> Column:
    # decimal(38,0) / decimal(7,0) -> decimal(38,6) in Spark's type rules:
    # exact for <=6 fractional digits, which covers price(2) * frac(2) *
    # frac(2). Integer `/` would go through double and round.
    return sum_long.cast("decimal(38,0)") / F.lit(10**digits).cast("decimal(7,0)")


def long_sum(sum_long: Column, digits: int) -> Column:
    """round4+double of an exact scaled-long SUM — same value (and same
    final double) as ``round4(F.sum(dec(...)))`` over the unscaled column."""
    return F.round(_unscale_dec(sum_long, digits), 4).cast("double")


def long_avg(sum_long: Column, digits: int, count: Column) -> Column:
    """Exact-sum / count as one IEEE divide — matches ``o_exact_avg``."""
    return long_sum(sum_long, digits) / count


def long_double(sum_long: Column, digits: int) -> Column:
    """Exact scaled-long SUM -> double without the round4 step — the analog
    of ``F.sum(dec(...)).cast("double")`` for values already inside 2^53."""
    return _unscale_dec(sum_long, digits).cast("double")


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

"""Cross-engine bit-determinism helpers.

Floating-point SUM/AVG are order-dependent; Spark and DuckDB will not in
general produce bit-identical doubles for the same aggregation, and the
driver compares value hashes. The fix: aggregate in exact DECIMAL space
(addition of decimals is associative and exact), then cast the final
result to DOUBLE — a single deterministic rounding that both engines
perform identically (IEEE-754 round-to-nearest).

Scales chosen so products stay exact: money columns carry <=2 fractional
digits, rates (discount/tax) <=4, so DECIMAL(18,4) x DECIMAL(8,4) etc.
never overflows DECIMAL(38,_) and never rounds.

Every Spark helper here has a mirror-image SQL builder for the DuckDB
oracle so both sides express literally the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side

MONEY = "decimal(18,4)"  # prices, balances, values (2dp data, room to spare)
RATE = "decimal(8,4)"  # discounts/taxes in [0,1] with 2dp
#: Small-magnitude quantities (|x| < 1e4, <=2dp — TPC-H l_quantity is
#: 1..50). Same VALUES as summing via MONEY, but sum(decimal(8,4)) has
#: result precision 18, which Spark accumulates as an unscaled LONG
#: (sum(UnscaledValue(...))) instead of a Decimal128-with-overflow-flag —
#: the fast codegen path (r18 guide §2.3 "narrower types": A1 measured
#: ~0.1 s). The sum itself stays bounded by FINAL's 1e12 contract, so the
#: narrowing loses nothing the wider type kept.
QTY = "decimal(8,4)"
#: Narrow money: columns that provably carry <=2 fractional digits AND
#: |x| < 1e6 (TPC-H-shaped prices: l_extendedprice < 105e3, o_totalprice
#: < 550e3 at ANY sf by construction; events.value < 1e3 — bounds pinned
#: in tests/test_parity.py::test_narrow_money_column_bounds). Cast to
#: scale 2 is value-exact for 2dp data on both engines, so sums/avgs are
#: bit-identical to the MONEY path — but sum(decimal(8,2)) has result
#: precision 18, the unscaled-LONG accumulation (guide §2.3 narrower
#: types; r18 measured J1 -0.2 s, W3 -0.12 s at sf0.1). Do NOT use for
#: columns with >2dp data (the cast would round: different result) or
#: values >= 1e6 (overflow NULLs under non-ANSI).
MONEY2 = "decimal(8,2)"

#: Final narrowing type applied to every exact decimal sum before the cast
#: to DOUBLE. Source data carries <=6 fractional digits, so this cast drops
#: nothing; crucially it is int64-backed in DuckDB (precision <= 18), so
#: decimal->double is a single correctly-rounded conversion on both engines
#: (wide int128-backed decimals double-round in DuckDB and can differ from
#: Java BigDecimal by 1 ulp). Constraint: |sum| < 1e12 — true at every
#: fixture scale and probe (sf0.1 max is 5.2e9; the K=30 probe ~1.6e11),
#: and verified fail-LOUD, not fail-silent: under Spark 4's ANSI default
#: an overflowing narrow raises NUMERIC_VALUE_OUT_OF_RANGE rather than
#: returning NULL. At true 100 TB scale (global money sums ~1e15+) this
#: narrowing is the one knob to change: keep the exact DECIMAL(38,_)
#: accumulation and either emit the decimal itself or accept the
#: engine-native decimal->double rounding — the 18,6 narrowing exists
#: only to make the *cross-engine oracle compare* bit-exact, a concern
#: that disappears when there is no DuckDB mirror to match.
FINAL = "decimal(18,6)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dnarrow(c: Column) -> Column:
    """Narrow an exact decimal aggregate to DOUBLE deterministically."""
    return c.cast(FINAL).cast("double")


def dsum(col: Column | str, typ: str = MONEY) -> Column:
    """Exact sum of a double column, returned as DOUBLE."""
    return dnarrow(F.sum(dec(col, typ)))


def davg(col: Column | str, typ: str = MONEY) -> Column:
    """Deterministic mean: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return dnarrow(F.sum(dec(c, typ))) / F.count(c)


def dstddev(col: Column | str, typ: str = MONEY) -> Column:
    """Deterministic sample stddev via exact decimal sums.

    sqrt((sum(x^2) - sum(x)^2/n) / (n-1)) with both sums exact, so the only
    fp ops are the final few — identical on both engines. Constraint: use
    on small-magnitude columns (|x| <= ~1e3) so sum(x^2) fits FINAL.

    The variance term is clamped at 0 before the sqrt: when a group's
    true variance is within rounding noise of zero (constant column),
    the final double ops can land a hair negative, where Spark returns
    NaN but DuckDB raises "cannot take square root of a negative
    number". GREATEST(_, 0) on both sides keeps the mirror exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = dnarrow(F.sum(dec(c, typ)))
    s2 = dnarrow(F.sum(dec(c, typ) * dec(c, typ)))
    return F.sqrt(F.greatest((s2 - s * s / n) / (n - F.lit(1.0)), F.lit(0.0)))


# --------------------------------------------------------------- DuckDB side


def sql_dnarrow(expr: str) -> str:
    return f"CAST(CAST({expr} AS {FINAL}) AS DOUBLE)"


def sql_dsum(expr: str, typ: str = MONEY) -> str:
    return sql_dnarrow(f"SUM(CAST({expr} AS {typ}))")


def sql_davg(expr: str, typ: str = MONEY) -> str:
    return f"{sql_dsum(expr, typ)} / COUNT({expr})"


def sql_dstddev(expr: str, typ: str = MONEY) -> str:
    s = sql_dsum(expr, typ)
    s2 = sql_dnarrow(f"SUM(CAST({expr} AS {typ}) * CAST({expr} AS {typ}))")
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    # GREATEST mirrors the Spark-side clamp (see dstddev)
    return f"SQRT(GREATEST(({s2} - {s} * {s} / {n}) / ({n} - 1.0), 0.0))"

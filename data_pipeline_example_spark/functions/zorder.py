"""Z-order (Morton) clustering keys as pure column expressions.

Sorting a write by ONE column gives tight parquet row-group min/max
stats on that column only; interleaving the bits of two columns into a
Morton key and range-sorting by it gives useful stats on BOTH — the
same layout idea behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as
an engine primitive (``sinks.write_zordered_parquet``) with no table
format required.

All pure bitwise arithmetic (shift/mask/or) on longs — whole-stage
codegen, no UDFs, works in any engine with the same semantics (the
oracle-style twin is trivial). Inputs must be non-negative and fit
32 bits; quantize first (epoch-day, ntile rank, hash bucket) — rank
space is what you want to interleave anyway, not raw values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 64-bit spread masks: insert one zero bit between every bit of a
# 32-bit value (the classic "Part1By1" sequence, widened to longs)
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits(col: Column) -> Column:
    """32-bit non-negative value → 64 bits with a zero interleaved
    between every source bit (bit i moves to position 2i)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Interleave two 32-bit non-negative columns into one 64-bit
    Z-order key: ``a`` occupies even bit positions, ``b`` odd ones.

    The raw interleave is an UNSIGNED 64-bit pattern carried in a
    signed long: when ``b`` has bit 31 set, bit 63 of the key is set
    and the signed value is negative — so do not ORDER BY this column
    directly for full-range inputs; sort by :func:`zorder_sort_key`,
    which flips the sign bit so signed order equals unsigned Z-curve
    order. (Inputs confined to 31 bits per column never set bit 63 and
    may sort on this key as-is.)"""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def zorder_sort_key(a: Column, b: Column) -> Column:
    """Sortable Z-order key: ``morton_key`` with the sign bit flipped
    (key XOR Long.MIN_VALUE), the standard unsigned-compare-via-signed
    trick — lexicographic signed order on this column walks the Z-curve
    for the FULL non-negative 32-bit input range, including values with
    bit 31 set."""
    return morton_key(a, b).bitwiseXOR(F.lit(-(1 << 63)).cast("long"))

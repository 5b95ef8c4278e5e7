"""Deterministic hash-bucket expressions shared by the sampling and
split operators.

One definition on purpose: the idiom (md5 of the stringified id, first
4 hex digits, mod 100) is oracle-coupled — every DuckDB twin spells the
identical arithmetic, so a drift in one Python copy would silently
break hash parity for its oracle. md5 + substring + conv are the
portable subset both engines compute bit-identically (see
functions/text.py for the same reasoning on content hashes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_pct(col: Column) -> Column:
    """Deterministic 0..99 bucket from the stringified key: stable
    across runs, engines, partitionings, and cluster sizes — no RNG."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")
        % 100
    )


def hash_frac(col: Column) -> Column:
    """Deterministic fraction in [0, 1) with 1/65536 granularity — the
    fine-grained twin of :func:`hash_pct` for fractional sampling rates
    (mixture materialization uses 4-dp rates that pct buckets would
    quantize away). Same oracle-portable md5+substring+conv arithmetic.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("double")
        / 65536.0
    )

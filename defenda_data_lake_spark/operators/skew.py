"""Skew-handling utilities.

First line of defense at scale is AQE's skew-join splitting (enabled in
``session.get_spark``), which rewrites oversized shuffle partitions at
runtime.  ``salted_join`` is the manual fallback for the cases AQE
can't fix: a shuffle where one key's rows exceed a single executor's
memory even after splitting (e.g. a security-event feed where one
``sourceipaddress`` is 30% of the traffic), or a skewed aggregation.

Mechanics: every row of the skewed (large) side gets a deterministic
salt in ``[0, salts)`` derived from a content hash — the key space
becomes ``(key, salt)`` with ``salts``-times finer granularity.  The
small side is replicated once per salt value so every salted key still
finds its match.  Cost: ``salts``x duplication of the small side —
use for genuinely small dimension sides only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt from a content hash (reproducible
    across retries, unlike rand())."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts)).cast("int"),
    )


def replicate_for_salts(
    df: DataFrame, salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Cross the small side with the salt domain (explode of a literal
    range — no shuffle)."""
    return df.withColumn(
        salt_col,
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to heavy key skew on the ``large`` side.

    Result is identical to ``large.join(small, on, how)`` for inner and
    left joins; the shuffle distributes each hot key over ``salts``
    partitions."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_large = with_salt(large, salts)
    salted_small = replicate_for_salts(small, salts)
    return salted_large.join(salted_small, on=[on, "_salt"], how=how).drop("_salt")

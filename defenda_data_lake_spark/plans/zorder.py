"""Z-order (Morton-curve) clustered writes: multi-column file skipping
from one sort key.

``lake_maintenance.compact_partition(sort_by=...)`` gives LINEAR
clustering — perfect footer min/max pruning on the leading sort column,
none on the others.  Z-ordering bit-interleaves fixed-width ranks of
several columns into one integer key; sorting by it gives every listed
column *partial* locality, so a range/equality predicate on ANY of them
overlaps only ~N^((d-1)/d) of N files instead of all of them — the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout, built here from plain
DataFrame ops (rank + interleave are pure codegen expressions; the
write is one range repartition + in-partition sort).

Mechanics: each column is mapped to a ``bits``-wide integer rank by
min/max scaling (the min/max come from one tiny aggregate — driver
scalars, like any broadcast dim); bit ``j`` of column ``c`` lands at
interleaved position ``j·ncols + c``.  Ranks, not raw values, go into
the curve, so wildly different column scales interleave fairly.

The key is a LAYOUT hint, not data: files written by
:func:`zorder_write` carry the original schema, and correctness never
depends on the curve — a bad ``bits`` choice only weakens pruning.
Skew caveat: min/max scaling degrades under extreme outliers (one huge
value compresses everyone else's ranks into few buckets); clamp such
columns upstream or Z-order on a pre-bucketed form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    ranked: Sequence[Column],
    bits: int = 16,
) -> Column:
    """Interleave pre-computed integer ranks (each in
    ``[0, 2^bits)``) into one Morton key — a pure codegen expression
    (``ncols·bits`` shift/mask/or terms, no UDF)."""
    ncols = len(ranked)
    if ncols < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    if not 1 <= bits <= 63 // ncols:
        raise ValueError(
            f"need 1 <= bits <= {63 // ncols} for {ncols} columns; got {bits}"
        )
    key = F.lit(0).cast("long")
    for c, r in enumerate(ranked):
        r = r.cast("long")
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, j).bitwiseAND(F.lit(1)),
                    j * ncols + c,
                )
            )
    return key


def _ranks(
    df: DataFrame, cols: Sequence[str], bits: int
) -> list[Column]:
    """Min/max-scaled ``bits``-wide ranks for ``cols`` (one aggregate
    job for all bounds; NULL ranks to 0 — NULLs cluster at the curve's
    origin, the same choice NULLS FIRST makes for linear sorts)."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    out = []
    for i, c in enumerate(cols):
        lo, hi = bounds[f"_lo_{i}"], bounds[f"_hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            out.append(F.lit(0))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo)))
            * F.lit(float(top))
            / F.lit(float(hi - lo))
        )
        rank = F.least(
            F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)
        )
        out.append(F.coalesce(rank, F.lit(0)))
    return out


def zorder_write(
    df: DataFrame,
    out_dir: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-ordered by ``cols`` into ``n_files`` parquet
    files: range-repartition on the Morton key (balanced file sizes —
    range, not hash, so the curve stays contiguous per file), sort
    within each file (tight row-group stats), drop the key.  Footer
    min/max on EVERY listed column then prunes: each file covers a
    compact curve segment, hence a compact box in value space."""
    key = zorder_key(_ranks(df, cols, bits), bits=bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_dir)
    )

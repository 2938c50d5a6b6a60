"""Incrementally-maintained rollup tables: persisted aggregates that a
delta (one new day, a late-data backfill) updates WITHOUT rescanning
history.

The lakehouse staple this implements: ``events`` grows by appended
partitions, a dashboard needs per-(event_type, day) counts / sums /
distinct users.  Recomputing the rollup nightly rescans the whole fact
table; maintaining it incrementally touches only the partitions the
delta lands in:

1. aggregate the DELTA to the rollup grain (map-side partial combine —
   the delta is the only raw data read);
2. read back ONLY the rollup partitions the delta touches (the touched
   set is collected driver-side — it is a list of partition VALUES,
   e.g. a handful of days, never rows) — a partition-pruned scan of an
   already-tiny table;
3. merge (every aggregate here is commutative + associative: sum/count
   merge by sum, min/max by min/max, distinct sketches by register
   max) and dynamically overwrite just those partitions.

All aggregates must be MERGEABLE for this to be exact — that is the
classic restriction (the same one streaming partial aggregation and
materialized-view maintenance live with).  Supported:

* ``sum`` / ``count`` / ``min`` / ``max`` over a column (``count``
  counts non-NULL; merge of counts is a sum);
* ``hll`` — distinct-count sketch stored as a ``map<string, int>``
  register column (index -> max rho, ≤ 2^p entries), the map-shaped
  form of :mod:`~defenda_data_lake_spark.operators.sketches`'s
  register table.  Merge = per-index max, and the merged map is
  REGISTER-IDENTICAL to a direct build over the union, so incremental
  maintenance is exact, not approximate-on-approximate.  Estimate with
  :func:`rollup_hll_estimate` (delegates to the audited
  ``hll_estimate_from_registers``).

Scale (100 TB): the delta aggregation is the only pass over raw rows
and partial-combines map-side; the rollup table itself is
grain-bounded (groups x partitions), the touched-partition read is
partition-pruned (plan-asserted in tests), and the overwrite is
per-partition (dynamic partitionOverwriteMode), so steady-state
maintenance cost is O(delta + touched partitions), independent of
history length.  Maps are stored with SORTED keys so the written
bytes are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.sketches import (
    _hll_check,
    hll_estimate_from_registers,
    hll_rho,
)

#: agg_spec: {out_col: (func, in_col)} with func in _FUNCS
_FUNCS = ("sum", "count", "min", "max", "hll")


def _check_spec(agg_spec: dict[str, tuple[str, str]]) -> None:
    if not agg_spec:
        raise ValueError("agg_spec must not be empty")
    for out, (func, _col) in agg_spec.items():
        if func not in _FUNCS:
            raise ValueError(f"unsupported agg func {func!r} for {out!r}")
        if out.startswith("_"):
            raise ValueError(f"output names must not start with '_': {out!r}")


def _hll_map_from_raw(
    df: DataFrame, keys: Sequence[str], col: str, p: int
) -> DataFrame:
    """``keys + [_hll_map]``: per key group, the sorted register map of
    ``col`` (index hex-prefix -> max rho).  Two bounded aggregations —
    raw rows reduce to ≤ 2^p register rows per group BEFORE the map is
    assembled; no unbounded collect_list ever sees raw data."""
    h = F.md5(F.col(col).cast("string"))
    regs = (
        df.filter(F.col(col).isNotNull())
        .select(
            *keys,
            F.substring(h, 1, p // 4).alias("_idx"),
            hll_rho(F.substring(h, p // 4 + 1, 14)).alias("_rho"),
        )
        .groupBy(*keys, "_idx")
        .agg(F.max("_rho").alias("_max"))
    )
    return regs.groupBy(*keys).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_idx", "_max")))
        ).alias("_hll_map")
    )


def _merge_hll_maps(
    df: DataFrame, keys: Sequence[str], map_col: str
) -> DataFrame:
    """``keys + [map_col]`` with the per-index max over all input maps
    (explode -> max -> reassemble sorted; bounded by 2^p per group)."""
    exploded = df.select(*keys, F.explode(F.col(map_col)).alias("_idx", "_max"))
    regs = exploded.groupBy(*keys, "_idx").agg(F.max("_max").alias("_max"))
    return regs.groupBy(*keys).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_idx", "_max")))
        ).alias(map_col)
    )


def _aggregate_to_grain(
    df: DataFrame,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    p: int,
) -> DataFrame:
    """Aggregate raw rows to the rollup grain (the 'partial' build —
    also the full build, since the aggregates are self-mergeable)."""
    plain: list[Column] = []
    for out, (func, col) in agg_spec.items():
        if func == "sum":
            plain.append(F.sum(F.col(col)).alias(out))
        elif func == "count":
            plain.append(F.count(F.col(col)).cast("long").alias(out))
        elif func == "min":
            plain.append(F.min(F.col(col)).alias(out))
        elif func == "max":
            plain.append(F.max(F.col(col)).alias(out))
    base = df.groupBy(*keys).agg(*plain) if plain else None
    for out, (func, col) in agg_spec.items():
        if func != "hll":
            continue
        m = _hll_map_from_raw(df, keys, col, p).withColumnRenamed(
            "_hll_map", out
        )
        # left join: a group whose sketch column is all-NULL still has
        # its plain aggregates; its register map is NULL (= empty)
        base = m if base is None else base.join(m, list(keys), "left")
    return base


def _merge_partials(
    parts: DataFrame,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge rollup-grain rows (union of old partitions + delta
    partials) back to one row per key group."""
    plain: list[Column] = []
    for out, (func, _col) in agg_spec.items():
        if func in ("sum", "count"):
            agg = F.sum(F.col(out))
            if func == "count":
                agg = agg.cast("long")
            plain.append(agg.alias(out))
        elif func == "min":
            plain.append(F.min(F.col(out)).alias(out))
        elif func == "max":
            plain.append(F.max(F.col(out)).alias(out))
    base = parts.groupBy(*keys).agg(*plain) if plain else None
    for out, (func, _col) in agg_spec.items():
        if func != "hll":
            continue
        m = _merge_hll_maps(parts, keys, out)
        base = m if base is None else base.join(m, list(keys), "left")
    return base


def build_rollup(
    df: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    agg_spec: dict[str, tuple[str, str]],
    path: str,
    p: int = 8,
) -> None:
    """One-time (re)build: aggregate ``df`` to ``keys`` grain
    (``partition_col`` must be one of ``keys``) and write partitioned
    by ``partition_col``."""
    _check_spec(agg_spec)
    _hll_check(p)
    if partition_col not in keys:
        raise ValueError(
            f"partition_col {partition_col!r} must be in keys {list(keys)}"
        )
    rolled = _aggregate_to_grain(df, keys, agg_spec, p)
    rolled.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def update_rollup(
    spark: SparkSession,
    path: str,
    delta_df: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    agg_spec: dict[str, tuple[str, str]],
    p: int = 8,
) -> list:
    """Fold a delta (new day, late backfill rows — any mix) into a
    persisted rollup: aggregates the DELTA only, reads back only the
    touched partitions (partition-pruned ``isin``), merges, and
    dynamically overwrites just those partitions.  Exact: the updated
    table equals a full rebuild over history+delta row-for-row
    (register-for-register for sketches) — parity is pinned in
    ``test_rollup.py``.

    Partition-value contract: ``partition_col`` values must round-trip
    through the directory-name encoding (read-back infers the
    partition column's type from the path) — use STRING partition
    values (``'2024-01-30'``), not types whose inferred read-back type
    could drift from the delta's column type and fail the merge union.

    Returns the touched partition values (driver-side list — one entry
    per touched PARTITION, never per row)."""
    _check_spec(agg_spec)
    _hll_check(p)
    if partition_col not in keys:
        raise ValueError(
            f"partition_col {partition_col!r} must be in keys {list(keys)}"
        )
    delta_part = _aggregate_to_grain(delta_df, keys, agg_spec, p)
    delta_part = delta_part.localCheckpoint(eager=True)
    touched = [
        r[0]
        for r in delta_part.select(partition_col).distinct().collect()
        if r[0] is not None
    ]
    if not touched:
        return []
    existing = spark.read.parquet(path).filter(
        F.col(partition_col).isin(touched)
    )
    # align column order (read-back partition column moves to the end)
    cols = delta_part.columns
    merged = _merge_partials(
        existing.select(*cols).unionByName(delta_part), keys, agg_spec
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched


def rollup_hll_estimate(
    rollup: DataFrame,
    map_col: str,
    group_by: Sequence[str] = (),
    p: int = 8,
    out: str = "hll_estimate",
) -> DataFrame:
    """Distinct estimate from a rollup's register-map column, merging
    across rows per ``group_by`` group first (e.g. per-day maps ->
    range-wide distinct users): explode to register rows and delegate
    to the audited batch estimator — numerically IDENTICAL to
    ``hll_distinct`` over the raw data (tested).  NULL maps (all-NULL
    sketch input) contribute nothing."""
    _hll_check(p)
    regs = rollup.filter(F.col(map_col).isNotNull()).select(
        *group_by, F.explode(F.col(map_col)).alias("_hll_idx", "_hll_rho")
    )
    regs = regs.groupBy(*group_by, "_hll_idx").agg(
        F.max("_hll_rho").alias("_hll_max")
    )
    return hll_estimate_from_registers(regs, group_by=group_by, p=p, out=out)

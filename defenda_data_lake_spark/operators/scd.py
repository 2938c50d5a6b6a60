"""Slowly-changing-dimension (type 2) history build.

The warehouse-maintenance twin of :mod:`.diff`: where ``snapshot_diff``
compares two *snapshots*, ``scd2_history`` compacts an *observation
log* (append-only rows of ``(key, attributes, observed-at)``) into
versioned validity intervals — the table shape every dimension join
against point-in-time state needs (and the natural build input for the
engine's as-of join, ``operators/asof.py``).

Reference parity note: the reference system keeps raw event history in
partitioned parquet and leaves temporal compaction to Athena SQL; this
module makes the operator first-class.  (reference:
``lambdas/utils/helpers.py`` stores events append-only; no native SCD
support exists there.)

Scale: ONE hash exchange on the dimension key.  Every step after the
shuffle is a sort or a window over that same key-clustered layout —
the change-flag lag, the running version sum, the per-version
observation count (``partitionBy(key, version)`` is satisfied by the
existing ``hash(key)`` distribution, so it costs a sort, not a second
exchange), the version-start filter, and the ``lead`` that closes each
interval.  At 100 TB the input would arrive partition-pruned by day
and the operator applied per dimension key-range; nothing here holds
more than a key's run in memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
    include_last_obs: bool = False,
) -> DataFrame:
    """Compact an observation log into SCD-2 validity intervals.

    Each output row is one *version*: a maximal run of consecutive
    observations (per key, ordered by ``ts_col`` then ``order_cols``)
    whose ``attr_cols`` are all unchanged.  Columns: the keys, the
    attributes, ``version`` (1-based per key), ``valid_from_s`` /
    ``valid_to_s`` (epoch seconds; ``valid_to_s`` is NULL for the
    current version), and ``n_obs`` (observations folded into the
    version).

    NULL attribute values are compared null-safely (NULL → NULL is
    "unchanged"); ties on ``ts_col`` are broken by ``order_cols`` —
    pass a unique column there or version boundaries within a tied
    timestamp are undefined.

    ``include_last_obs=True`` appends ``first_obs_us`` / ``last_obs_us``
    (epoch MICROS of the version's first/final observation) — the
    high-water marks the streaming fold (``streaming/scd.py``) needs
    for late-arrival detection.  Off by default so the q99 oracle
    schema stays fixed.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    changed: Column = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # the first observation of a key has lag() == NULL for every attr:
    # eqNullSafe against a non-null value is False there, so `changed`
    # already fires — except when the first value IS NULL.  Catch that
    # with an explicit first-row test on the row number.
    first_row = F.row_number().over(w) == 1
    flag = F.when(first_row | changed, F.lit(1)).otherwise(F.lit(0))

    sec = F.floor(F.unix_micros(F.col(ts_col)) / 1_000_000)
    versioned = (
        df.withColumn("_chg", flag)
        .withColumn("version", F.sum("_chg").over(run))
        .withColumn("_obs_s", sec)
        .withColumn("_obs_us", F.unix_micros(F.col(ts_col)))
    )

    # per-version observation count: partitioning by (keys..., version)
    # is satisfied by the hash(keys) layout the windows above built —
    # Spark inserts a sort, not a second exchange (pinned in the plan
    # test).  The version-start row is exactly the row whose change
    # flag fired (it is first in the version by construction), so no
    # row_number pass is needed to find it.
    wv = Window.partitionBy(*keys, "version")
    counted = versioned.withColumn("n_obs", F.count("*").over(wv))
    extra: list = []
    if include_last_obs:
        counted = counted.withColumn("last_obs_us", F.max("_obs_us").over(wv))
        # the version-start row IS the version's first observation, so
        # its own _obs_us is first_obs_us
        extra = [F.col("_obs_us").alias("first_obs_us"), F.col("last_obs_us")]

    starts = counted.filter(F.col("_chg") == 1).select(
        *keys,
        *attrs,
        F.col("version"),
        F.col("_obs_s").alias("valid_from_s"),
        F.col("n_obs"),
        *extra,
    )
    wnext = Window.partitionBy(*keys).orderBy("version")
    extra_names = ["first_obs_us", "last_obs_us"] if include_last_obs else []
    return starts.withColumn(
        "valid_to_s", F.lead("valid_from_s").over(wnext)
    ).select(
        *keys, *attrs, "version", "valid_from_s", "valid_to_s", "n_obs",
        *extra_names,
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts_col: str,
    how: str = "left",
    dim_prefix: str = "",
) -> DataFrame:
    """Point-in-time enrichment: join each fact row to the dimension
    VERSION that was valid at the fact's event time — the consumer of
    :func:`scd2_history` (and of ``streaming.scd``'s maintained
    table).  ``valid_from_s`` is inclusive, ``valid_to_s`` exclusive,
    NULL ``valid_to_s`` = the open current version, so every fact
    matches at most one version; facts earlier than the key's first
    version keep NULL attributes under ``how='left'``.

    Scale notes (100 TB): this is an EQUI-join on the keys with the
    interval test as a cheap join residual — never a range-only join
    or a cross product; both sides hash/sort on the same key layout
    and versions-per-key is small by construction, so the residual
    scans a handful of rows per fact.  The fact timestamp is folded
    to epoch seconds (accepts TIMESTAMP or epoch-seconds LONG — the
    long→timestamp→long round trip is the identity).

    Dimension columns are appended under ``dim_prefix + name``; a
    collision with a fact column raises up front (an ambiguous
    duplicate name would otherwise surface only at the first
    downstream reference or parquet write)."""
    keys = list(key_cols)
    appended = {f"{dim_prefix}{c}" for c in dim.columns if c not in keys}
    clash = sorted(appended & set(facts.columns))
    if clash:
        raise ValueError(
            f"scd2_lookup output would duplicate fact column(s) {clash}; "
            "pass dim_prefix= to disambiguate"
        )
    f = facts.alias("_f")
    d = dim.alias("_d")
    fact_s = F.col(f"_f.{fact_ts_col}").cast("timestamp").cast("long")
    cond = None
    for k in keys:
        c = F.col(f"_f.{k}") == F.col(f"_d.{k}")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (fact_s >= F.col("_d.valid_from_s"))
        & (
            F.col("_d.valid_to_s").isNull()
            | (fact_s < F.col("_d.valid_to_s"))
        )
    )
    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, how).select(
        "_f.*",
        *[F.col(f"_d.{c}").alias(f"{dim_prefix}{c}") for c in dim_cols],
    )

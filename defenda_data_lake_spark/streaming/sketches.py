"""Streaming sketches: the bounded-state aggregates of
``operators.sketches`` maintained incrementally over a stream.

A sketch is the one aggregation shape that needs NO watermark to stay
bounded on a stream: its state is bounded by CONSTRUCTION (d·w cells
for count-min, 2^p registers for HLL), not by a time horizon — the
whole point of the structure survives the move to streaming unchanged.
The kernel here keeps the same cell layout as the batch operator, so
downstream consumers (``count_min_lookup``, dashboards, the oracle
replays) read the streaming table and the batch table identically,
and a streaming sketch can be seeded FROM a batch one (state is just
the cell table).

Scale: state is keyed by a bounded shard id (default 8), never by the
cell — ``applyInPandasWithState`` pays a per-GROUP Python call floor
(~1 ms/group/batch), so keying by cell would pay d·w calls per batch;
one call per shard serves thousands of cells (the same group-call
amortization as ``streaming.dedup``'s ``shards=N`` kernels).  The
shard count bounds per-call state size: d·16^w/shards cells each.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from defenda_data_lake_spark.operators.sketches import (
    _cm_check,
    _cm_probe,
    _hll_check,
    _hq_check,
    count_min_table,
    histogram_bin_table,
    hll_register_table,
    hll_rho,
)

CM_CELL_SCHEMA = "_cm_row int, _cm_pos string, _cm_count long"
_CM_STATE_SCHEMA = (
    "rows array<int>, poss array<string>, counts array<long>"
)
HLL_REGISTER_SCHEMA = "_hll_idx string, _hll_max int"
_HLL_STATE_SCHEMA = "idxs array<string>, maxs array<int>"
HQ_BIN_SCHEMA = "_hq_bin long, _hq_cnt long"
_HQ_STATE_SCHEMA = "bins array<long>, counts array<long>"


def count_min_stream(
    df: DataFrame,
    col: str,
    d: int = 3,
    w_hex_digits: int = 3,
    shards: int = 8,
) -> DataFrame:
    """Maintain a count-min sketch of ``col`` occurrences over a
    stream: same cells, same md5-substring probes, same one-sided
    guarantee as :func:`operators.sketches.count_min_table` — each
    micro-batch emits the cells it TOUCHED with their new cumulative
    counts (``outputMode("update")`` semantics: latest row per
    (row, pos) is the live sketch; read with a max-by or last-by).

    On a batch DataFrame this is exactly ``count_min_table`` (no
    grouping column — one global sketch), so batch/streaming parity is
    definitional; the parity test pins the streamed cumulative cells
    to the batch cell table anyway.

    No watermark, no timeout: state is bounded at ``d·16^w_hex_digits``
    cells by construction and only ever grows toward that cap —
    nothing to evict.  NULLs are ignored (a NULL is not a value with a
    frequency), matching the batch operator."""
    _cm_check(d, w_hex_digits)
    if shards < 1:
        raise ValueError(f"shards must be >= 1; got {shards}")
    if not df.isStreaming:
        return count_min_table(df, col, d=d, w_hex_digits=w_hex_digits)

    probes = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(_cm_probe(F.col(col), d, w_hex_digits)).alias("_cm"))
        .select("_cm._cm_row", "_cm._cm_pos")
        .withColumn(
            "_cm_shard",
            F.pmod(
                F.xxhash64(F.col("_cm_row"), F.col("_cm_pos")),
                F.lit(shards),
            ).cast("int"),
        )
    )

    def update(key, batches, state):
        table: dict[tuple[int, str], int] = {}
        if state.exists:
            rows_, poss, counts = state.get
            table = {
                (int(r), str(p)): int(c)
                for r, p, c in zip(rows_, poss, counts)
            }
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        agg = rows.groupby(["_cm_row", "_cm_pos"], sort=False).size()
        out_r: list[int] = []
        out_p: list[str] = []
        out_c: list[int] = []
        for (r, p), n in agg.items():
            k = (int(r), str(p))
            table[k] = table.get(k, 0) + int(n)
            out_r.append(k[0])
            out_p.append(k[1])
            out_c.append(table[k])
        items = sorted(table.items())
        state.update(
            (
                [k[0] for k, _ in items],
                [k[1] for k, _ in items],
                [c for _, c in items],
            )
        )
        yield pd.DataFrame(
            {
                "_cm_row": pd.Series(out_r, dtype="int32"),
                "_cm_pos": pd.Series(out_p, dtype="str"),
                "_cm_count": pd.Series(out_c, dtype="int64"),
            }
        )

    return probes.groupBy("_cm_shard").applyInPandasWithState(
        update,
        outputStructType=CM_CELL_SCHEMA,
        stateStructType=_CM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_stream(
    df: DataFrame,
    col: str,
    p: int = 8,
    shards: int = 8,
) -> DataFrame:
    """Maintain an HLL register table of ``col`` over a stream: same
    md5-derived registers as
    :func:`operators.sketches.hll_register_table`, each micro-batch
    emitting the registers whose max-rho CHANGED (update semantics:
    latest row per ``_hll_idx`` is the live register; feed the
    max-reduced table to ``hll_estimate_from_registers`` — or
    ``hll_merge`` it with batch-built tables, registers are registers).

    On a batch DataFrame this is exactly ``hll_register_table``.
    State is ≤ ``2^p`` registers by construction and only ever
    ratchets upward — no watermark, nothing to evict; NULLs ignored.
    Registers are monotone (max), so the changed-only emission loses
    nothing and keeps update batches tiny once the sketch saturates."""
    _hll_check(p)
    if shards < 1:
        raise ValueError(f"shards must be >= 1; got {shards}")
    if not df.isStreaming:
        return hll_register_table(df, col, p=p)

    h = F.md5(F.col(col).cast("string"))
    probes = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.substring(h, 1, p // 4).alias("_hll_idx"),
            hll_rho(F.substring(h, p // 4 + 1, 14)).alias("_hll_rho"),
        )
        .withColumn(
            "_hll_shard",
            F.pmod(F.xxhash64(F.col("_hll_idx")), F.lit(shards)).cast("int"),
        )
    )

    def update(key, batches, state):
        table: dict[str, int] = {}
        if state.exists:
            idxs, maxs = state.get
            table = {str(i): int(x) for i, x in zip(idxs, maxs)}
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        agg = rows.groupby("_hll_idx", sort=False)["_hll_rho"].max()
        out_i: list[str] = []
        out_m: list[int] = []
        for idx, rho in agg.items():
            idx, rho = str(idx), int(rho)
            if rho > table.get(idx, 0):
                table[idx] = rho
                out_i.append(idx)
                out_m.append(rho)
        if out_i:
            items = sorted(table.items())
            state.update(
                ([i for i, _ in items], [m for _, m in items])
            )
            yield pd.DataFrame(
                {
                    "_hll_idx": pd.Series(out_i, dtype="str"),
                    "_hll_max": pd.Series(out_m, dtype="int32"),
                }
            )

    return probes.groupBy("_hll_shard").applyInPandasWithState(
        update,
        outputStructType=HLL_REGISTER_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def histogram_bins_stream(
    df: DataFrame,
    col: str,
    width: float = 1.0,
    lo: float | None = None,
    hi: float | None = None,
    shards: int = 8,
) -> DataFrame:
    """Maintain a histogram quantile sketch's bin table over a stream
    (same bins as :func:`operators.sketches.histogram_bin_table`),
    each micro-batch emitting the TOUCHED bins with their cumulative
    counts — feed the latest row per bin to
    ``histogram_quantiles_from_bins`` for live p50/p90/p99.

    STREAMS REQUIRE the ``[lo, hi]`` clamp: it is what bounds the
    state at ``(hi-lo)/width + 2`` bins — on an unbounded stream an
    unclamped bin table could grow with the value range forever (the
    batch operator can afford optional clamping; a stateful operator
    cannot).  Batch DataFrames fall through to the batch operator,
    clamp optional as there."""
    if not df.isStreaming:
        return histogram_bin_table(df, col, width=width, lo=lo, hi=hi)
    if lo is None or hi is None:
        raise ValueError(
            "histogram_bins_stream requires lo and hi on a stream: the "
            "clamp is what bounds the state"
        )
    _hq_check(width, lo, hi)
    if shards < 1:
        raise ValueError(f"shards must be >= 1; got {shards}")

    v = F.greatest(
        F.lit(float(lo)), F.least(F.lit(float(hi)), F.col(col).cast("double"))
    )
    probes = (
        df.filter(F.col(col).isNotNull())
        .select(F.floor(v / F.lit(float(width))).alias("_hq_bin"))
        .withColumn(
            "_hq_shard",
            F.pmod(F.xxhash64(F.col("_hq_bin")), F.lit(shards)).cast("int"),
        )
    )

    def update(key, batches, state):
        table: dict[int, int] = {}
        if state.exists:
            bins_, counts = state.get
            table = {int(b): int(c) for b, c in zip(bins_, counts)}
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        agg = rows.groupby("_hq_bin", sort=False).size()
        out_b: list[int] = []
        out_c: list[int] = []
        for b, n in agg.items():
            b = int(b)
            table[b] = table.get(b, 0) + int(n)
            out_b.append(b)
            out_c.append(table[b])
        items = sorted(table.items())
        state.update(
            ([b for b, _ in items], [c for _, c in items])
        )
        yield pd.DataFrame(
            {
                "_hq_bin": pd.Series(out_b, dtype="int64"),
                "_hq_cnt": pd.Series(out_c, dtype="int64"),
            }
        )

    return probes.groupBy("_hq_shard").applyInPandasWithState(
        update,
        outputStructType=HQ_BIN_SCHEMA,
        stateStructType=_HQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

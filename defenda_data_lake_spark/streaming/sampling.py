"""Streaming group-budget admission: meter documents INTO a training
mix at ingest time, admitting each group (language, source, domain)
only until its token budget is exhausted — the arrival-order streaming
twin of ``operators.sampling.group_token_budget_select``.

Contract difference from the batch operator, stated up front: the
batch mix-spec RANKS each group globally (best documents first) before
filling the budget; a stream cannot rank documents it has not seen, so
the streaming form is greedy FIRST-FIT — rows are considered in
``order_col`` order within each micro-batch and in arrival order
across batches, a row is admitted iff its tokens still fit
(``used + tokens <= budget``), and a rejected row does NOT consume
budget (a later smaller document can still fit).  The result is
deterministic GIVEN the micro-batch sequence; for a corpus at rest
where ranking matters, use the batch operator.

No row is lost (the ``near_dedupe_stream`` invariant): every input
row is emitted with an ``admitted`` flag and the group's
``cum_tokens`` after the decision, so downstream can route admitted
rows to the mix and audit the rejects.  Rows with NULL group or NULL
token cannot be metered and emit ``admitted = false`` unconditionally.

Scale: state is ONE long counter per group — bounded by the group
vocabulary (languages/sources), no watermark, no timeout, nothing to
evict.  Per-group admission is inherently sequential (the q39 packing
argument: a global running total is the semantics), but groups run in
parallel across the cluster and the per-group Python call floor is
amortized over every row of the group in the batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

ADMISSION_SCHEMA = (
    "id string, grp string, tokens long, admitted boolean, cum_tokens long"
)
_STATE_SCHEMA = "used long"


def _admit_rows(
    rows: pd.DataFrame, used: int, budget: int | None
) -> tuple[pd.DataFrame, int]:
    """Greedy first-fit over ``rows`` (already ordered): returns the
    decided frame and the updated counter.  ``budget`` None means the
    group is not in the spec — admit nothing (strict mix)."""
    admitted: list[bool] = []
    cums: list[int] = []
    for tok in rows["tokens"]:
        ok = (
            budget is not None
            and not pd.isna(tok)
            and int(tok) >= 0
            and used + int(tok) <= budget
        )
        if ok:
            used += int(tok)
        admitted.append(bool(ok))
        cums.append(used)
    out = rows.copy()
    # nullable Int64: a NULL-token reject row must convert to an Arrow
    # null, not trip a NaN-to-int64 conversion error
    out["tokens"] = out["tokens"].astype("Int64")
    out["admitted"] = pd.Series(admitted, index=rows.index, dtype=bool)
    out["cum_tokens"] = pd.Series(cums, index=rows.index, dtype="int64")
    return out, used


def group_budget_admission(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    order_col: str,
    budgets: dict[str, int] | None = None,
    default_budget: int | None = None,
) -> DataFrame:
    """Admit rows into a per-group token budget over a stream (see
    module docstring for the first-fit contract).  ``budgets`` maps
    group -> max tokens; groups absent from the spec fall back to
    ``default_budget`` (None = strict mix, admit nothing).  Emits
    ``(id, grp, tokens, admitted, cum_tokens)`` for EVERY input row.

    ``order_col`` must totally order rows within a (group,
    micro-batch) slice — ties sort by id as a deterministic backstop.
    Output ``id``/``grp`` are emitted as STRINGS (fixed output schema;
    join back to payloads on the stringified id).

    On a batch DataFrame the same kernel runs via ``applyInPandas``
    with zero starting counters, so single-batch streaming parity is
    definitional (and pinned by test anyway)."""
    if budgets is None and default_budget is None:
        raise ValueError("pass budgets and/or default_budget")
    if budgets is not None and any(v < 0 for v in budgets.values()):
        raise ValueError("budgets must be >= 0")
    if default_budget is not None and default_budget < 0:
        raise ValueError(f"default_budget must be >= 0; got {default_budget}")
    # keys coerced into the projected group domain (the group column is
    # cast to string below, so {1: ...} must match an int group column)
    spec = {str(k): int(v) for k, v in (budgets or {}).items()}

    projected = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(group_col).cast("string").alias("grp"),
        F.col(token_col).cast("long").alias("tokens"),
        # native type preserved: a string cast would order numerics
        # lexicographically ("10" < "2")
        F.col(order_col).alias("_ord"),
    )

    def _budget_for(grp) -> int | None:
        if grp is None or (isinstance(grp, float) and pd.isna(grp)):
            return None
        return spec.get(str(grp), default_budget)

    def update(key, batches, state):
        used = int(state.get[0]) if state.exists else 0
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        rows = rows.sort_values(["_ord", "id"], kind="mergesort")
        budget = _budget_for(key[0])
        out, used = _admit_rows(rows, used, budget)
        # no counter for budget-less groups: a strict-mix stream with
        # high-cardinality unlisted groups must not grow state per
        # group it will never admit (rejects consume nothing, so the
        # zero counter is semantically redundant); with
        # default_budget set, state scales with OBSERVED group
        # cardinality — the caller's spec decides that trade
        if budget is not None:
            state.update((used,))
        yield out[["id", "grp", "tokens", "admitted", "cum_tokens"]]

    if not df.isStreaming:

        def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["_ord", "id"], kind="mergesort")
            grp = pdf["grp"].iloc[0] if len(pdf) else None
            out, _ = _admit_rows(pdf, 0, _budget_for(grp))
            return out[["id", "grp", "tokens", "admitted", "cum_tokens"]]

        return projected.groupBy("grp").applyInPandas(
            batch_fn, schema=ADMISSION_SCHEMA
        )

    return projected.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=ADMISSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

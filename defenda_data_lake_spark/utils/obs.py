"""Per-batch observability lines for the maintenance folds (VERDICT
r8 item 6): CDC and SCD folds return loss counters (``late_dropped``,
``tombstoned``) and streaming near-dedup exposes
``watermark_drop_counts`` — this module turns those into ONE
fixed-format, greppable log line so an operator sees row loss without
reading code.  The demos print these per batch; a test pins that the
logged count equals a planted late-row count."""

from __future__ import annotations

# counters printed in this fixed order when present, loss counters
# always included so a zero is visible evidence, not an omission
_COUNTER_ORDER = (
    "applied",
    "deleted",
    "runs",
    "appended",
    "late_dropped",
    "tombstoned",
    "dropped_by_watermark",
    "delta_fit",
    "rebuild_recommended",
)


def fold_log_line(stage: str, batch_id, stats: dict) -> str:
    """``[stage] batch=<id> applied=.. late_dropped=.. ...`` — one
    line per fold, counters in a fixed order, bucket count appended
    when the fold reports touched buckets."""
    def _fmt(v):
        # bools/ints print as counters; ratio-valued stats (the IVF
        # fit numbers) keep 4 decimals instead of truncating to 0, and
        # a None (fit not measurable this batch — empty delta, or
        # every row landed in a new list) prints as 'na' rather than
        # killing the stream's on_batch hook with a TypeError
        if v is None:
            return "na"
        if isinstance(v, float) and not v.is_integer():
            return f"{v:.4f}"
        return str(int(v))

    parts = [
        f"{k}={_fmt(stats[k])}" for k in _COUNTER_ORDER if k in stats
    ]
    if "touched_buckets" in stats:
        parts.append(f"touched_buckets={len(stats['touched_buckets'])}")
    return f"[{stage}] batch={batch_id} " + " ".join(parts)

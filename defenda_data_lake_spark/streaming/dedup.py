"""Streaming deduplication over the event stream.

The batch dedup operators (``operators.dedup``) answer "which documents
in the corpus are duplicates"; these answer the streaming form: "drop
re-deliveries as they arrive".  Re-delivery is the normal case for the
reference's transport (Firehose retries are at-least-once; reference
README.md's ingest path has no dedup stage, so duplicate events land in
the table) — a continuous pipeline wants them dropped at ingest.

Built on ``dropDuplicatesWithinWatermark``: exact-once *within the
watermark horizon* with state bounded by it — the engine evicts a key's
state once the watermark passes its event time, so memory is
O(keys per horizon), not O(all keys ever).  An unbounded
``dropDuplicates`` on a stream would grow state forever; a horizon is
the correct contract at 100 TB/day (a duplicate delivered three days
late is a reprocessing job, not a streaming concern).

Scale: one shuffle on the dedup key; the state store partitions the
same way, so executors split compute and state linearly.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_stream(
    events: DataFrame,
    keys: Sequence[str] = ("eventid",),
    watermark_delay: str = "1 hour",
    event_time_col: str = "utctimestamp",
    horizon_mode: str = "processing",
) -> DataFrame:
    """Drop re-deliveries of the same ``keys`` arriving within
    ``watermark_delay`` of each other.  Works on batch DataFrames too
    (plain ``dropDuplicates`` — batch has no horizon to bound).

    ``horizon_mode`` is the same contract knob as
    ``near_dedupe_stream``'s ``timeout_mode``
    (``dropDuplicatesWithinWatermark`` documents "too late data older
    than watermark will be dropped" — the silent row loss the round-7
    probe caught in the near-dedup stage applies here identically):

    - ``"processing"`` (default): the watermark rides the ARRIVAL time
      (micro-batch timestamp), so no row is ever behind it — a unique
      event is NEVER silently discarded for having an old event
      timestamp, and re-deliveries are suppressed within an arrival-
      time horizon (the natural shape of at-least-once retries).
    - ``"event"``: the watermark rides ``event_time_col`` — horizon
      deterministic in event time under replay, late rows dropped by
      the engine (documented Spark semantics).

    The output schema is the input schema, unchanged — the time column
    the watermark needs is internal (underscore-named so it can't
    clobber a caller's column) and dropped before returning."""
    if horizon_mode not in ("processing", "event"):
        raise ValueError(
            f"horizon_mode must be 'processing' or 'event'; got {horizon_mode!r}"
        )
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    if horizon_mode == "event":
        time_col = F.to_timestamp(F.col(event_time_col))
    else:
        time_col = F.current_timestamp()
    df = (
        events.withColumn("_dedup_event_time", time_col)
        .withWatermark("_dedup_event_time", watermark_delay)
    )
    return df.dropDuplicatesWithinWatermark(list(keys)).drop("_dedup_event_time")


def content_dedupe_stream(
    events: DataFrame,
    text_col: str = "summary",
    watermark_delay: str = "1 hour",
    event_time_col: str = "utctimestamp",
    horizon_mode: str = "processing",
) -> DataFrame:
    """Content-hash variant: dedup on a digest of the normalized text
    (the streaming twin of ``operators.dedup.exact_dedup``) rather than
    an id — catches re-sends that minted fresh event ids.  Schema is
    the input schema, unchanged (the digest is internal);
    ``horizon_mode`` as in :func:`dedupe_stream`."""
    from defenda_data_lake_spark.operators.dedup import normalized_text

    df = events.withColumn(
        "_dedup_content_hash", F.md5(normalized_text(F.col(text_col)))
    )
    return dedupe_stream(
        df,
        keys=("_dedup_content_hash",),
        watermark_delay=watermark_delay,
        event_time_col=event_time_col,
        horizon_mode=horizon_mode,
    ).drop("_dedup_content_hash")


class _ShardState:
    """Shared scaffolding for the sharded (``shards=N``) stateful dedup
    kernels: a shard's bucket table held COLUMNAR — one object array of
    bucket signatures plus one numpy array per entry field — so every
    per-batch operation (lookup, claimant seeding, anchor/count/expiry
    update, prune, write-back) is a vectorized array op instead of a
    Python loop over entries.  The round-7 dict-of-lists form walked
    every entry per batch in Python; at horizon-scale tables (thousands
    of buckets per shard) the walk, not the state math, dominated — the
    r7 probe measured the sharded stage at 12.6k ev/s with SCALING.md
    attributing the residual to exactly this loop.  Both kernels
    (``lsh_candidates_stream`` and ``near_dedupe_stream``) share this
    class so they cannot desynchronize on eviction timing.

    ``dtypes`` is one numpy dtype per entry field ('object' for
    strings) and the LAST field must be the entry's expiry in epoch
    millis — the exact timeout the per-bucket kernel would have
    registered at this entry's last data batch.

    Wire format: the whole table crosses the state store as ONE
    ``binary`` field holding a pickle of the numpy arrays
    (``_SHARD_STATE_SCHEMA``).  The earlier ``array<string>``/
    ``array<long>`` row schema made the JVM side pickle and unpickle
    every ENTRY as an object each batch (applyInPandasWithState ships
    state values through Pyrolite) — profiled at ~1 s of JVM CPU per
    task per batch at horizon-scale tables, the stateful stage's
    single largest cost after the round-8 payload packing.  As an
    opaque blob the JVM cost is one byte-array copy; numpy arrays
    pickle/unpickle at buffer speed.  The blob is produced and
    consumed only by this class (same trust boundary as the state
    store itself).

    Prune contract (mirrors the engine's per-bucket timeout timing):
    an entry is dropped when the watermark has passed ITS stored
    expiry and the current batch brought it no rows (the engine never
    times out a group WITH data); the shard's engine timeout is then
    re-registered at the earliest surviving expiry so expired entries
    are revisited (and pruned) on time."""

    def __init__(self, state, dtypes: Sequence[str]):
        import pickle

        import numpy as np

        self.state = state
        self._dtypes = tuple(dtypes)
        self.wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            sigs, cols = pickle.loads(bytes(state.get[0]))
            self.sigs = sigs
            self.cols = cols
        else:
            self.sigs = np.empty(0, dtype=object)
            self.cols = [np.empty(0, dtype=dt) for dt in dtypes]

    def lookup_or_append(self, uniq_sigs, defaults):
        """Row index in the bucket table for each signature in
        ``uniq_sigs`` (must be unique), appending fresh entries — their
        field values taken from the aligned ``defaults`` arrays — for
        signatures the table hasn't seen.  The lookup is one hash join
        (``pd.Index.get_indexer``), not a per-signature dict probe.
        Returns ``(idx, fresh)`` where ``fresh`` marks the entries
        appended by THIS call — i.e. buckets claimed this micro-batch
        — which the claimant-re-send guard needs: a bucket that
        pre-existed judges its own claimant id by agreement (round
        12, VERDICT r11 item 1)."""
        import numpy as np

        if len(self.sigs):
            idx = pd.Index(self.sigs).get_indexer(uniq_sigs)
        else:
            idx = np.full(len(uniq_sigs), -1, dtype="int64")
        new = idx < 0
        if new.any():
            n0 = len(self.sigs)
            self.sigs = np.concatenate([self.sigs, uniq_sigs[new]])
            self.cols = [
                np.concatenate([c, np.asarray(d, dtype=dt)[new]])
                for c, d, dt in zip(self.cols, defaults, self._dtypes)
            ]
            idx[new] = n0 + np.arange(int(new.sum()))
        return idx, new

    def persist(self, touched_idx=None) -> None:
        keep = self.cols[-1] >= self.wm_ms
        if touched_idx is not None and len(touched_idx):
            keep[touched_idx] = True
        if not keep.all():
            self.sigs = self.sigs[keep]
            self.cols = [c[keep] for c in self.cols]
        if not len(self.sigs):
            self.state.remove()
            return
        import pickle

        self.state.update(
            (pickle.dumps((self.sigs, self.cols), protocol=5),)
        )
        next_ms = int(self.cols[-1].min())
        self.state.setTimeoutTimestamp(max(next_ms, self.wm_ms + 1))


def _json_roundtrips(dtype) -> bool:
    """True when ``to_json`` -> ``from_json`` reproduces a column of
    this type bit-for-bit: strings, integral numbers, booleans, and
    arrays / structs / string-keyed maps of those.  Floating point,
    timestamp/date, decimal, and binary columns are excluded — JSON
    text formatting of those is not guaranteed faithful — so payloads
    containing them keep ``near_dedupe_stream``'s unpacked path."""
    from pyspark.sql import types as T

    if isinstance(
        dtype,
        (
            T.StringType,
            T.BooleanType,
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
        ),
    ):
        return True
    if isinstance(dtype, T.ArrayType):
        return _json_roundtrips(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return isinstance(dtype.keyType, T.StringType) and _json_roundtrips(
            dtype.valueType
        )
    if isinstance(dtype, T.StructType):
        return all(_json_roundtrips(f.dataType) for f in dtype.fields)
    return False


LSH_CANDIDATE_SCHEMA = "doc_id long, first_doc long, band int, band_sig string"
# v2 state (round 6): added n_seen for the bucket cap.  State-store
# schemas are versioned by the CHECKPOINT, not the code — a query
# checkpointed under the 2-field v1 state cannot resume on this code
# (Spark's state schema check rejects the widening).  Migration path:
# restart with a FRESH checkpoint and rebuild the state by replaying
# the watermark horizon's already-landed rows through the same stateful
# kernel — :func:`seed_near_dedup_state` composes the replay (seed rows
# are marked so the sink suppresses their re-emitted verdicts); without
# a seed, a bare fresh checkpoint misses up to one horizon of dedup.
_LSH_STATE_SCHEMA = "first_doc long, first_us long, n_seen long"
# Sharded-kernel state (round 8, v3): the whole shard table as one
# opaque pickled-numpy blob — see ``_ShardState``.  Checkpoints taken
# under the round-7 array-typed shard state need the same
# fresh-checkpoint + ``seed_near_dedup_state`` migration as v1 -> v2.
_SHARD_STATE_SCHEMA = "blob binary"


def lsh_candidates_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str = "event_time",
    watermark_delay: str = "1 hour",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    max_bucket_docs: int | None = None,
    timeout_mode: str = "processing",
    shards: int | None = None,
) -> DataFrame:
    """Streaming NEAR-duplicate candidate generation — the streaming
    twin of ``operators.dedup.minhash_lsh_candidates``: as documents
    arrive, each is hashed into its MinHash LSH buckets, and a bucket
    that already saw an earlier document emits a candidate row
    ``(doc_id, first_doc, band, band_sig)`` mapping the newcomer to the
    bucket's first claimant.  Downstream consumers verify (exact
    Jaccard / cosine) or drop on sight — exactly how a continuous
    crawl ingest discards near-re-posts without a nightly batch job.

    Claimant re-sends (round 12): once a bucket PRE-EXISTS (claimed in
    an earlier micro-batch), a re-delivered row carrying the
    claimant's own id emits a SELF-candidate ``doc_id == first_doc``
    — the marker that THIS ARRIVAL is a re-send of the claimant.
    Consumers act on the arriving copy (suppress/divert the re-send);
    a consumer that instead deletes by id would remove the landed
    original — candidates name arrivals, not storage.  Within the
    claiming batch the claimant never self-pairs, so the batch twin
    ``minhash_lsh_candidates`` (one pass, unique ids) never produces
    ``a == b`` rows and parity with it is unchanged.

    Statefulness: ONE ``applyInPandasWithState`` keyed by (band,
    band_sig).  State per bucket is three longs (first doc id, the
    timeout anchor in the watermark's domain, cumulative count); the
    timeout evicts a bucket once the watermark passes its last
    activity + horizon, so state is bounded by buckets-per-horizon,
    not all buckets ever — same contract as ``dedupe_stream``.  A doc with duplicate content in ``bands``
    buckets emits up to ``bands`` candidate rows (band granularity is
    preserved deliberately; `.distinct()` downstream if pairs are all
    that matters).

    Within one micro-batch, arrival order is by event time (ties by
    id) — deterministic given the batch contents.  Works only on
    streaming inputs; for batch use ``minhash_lsh_candidates``.

    Malformed or missing event times: the cast is ``try_to_timestamp``
    (one poison record must not wedge a continuous query on replay —
    ANSI ``to_timestamp`` would fail the micro-batch forever), and
    rows without a parseable event time are filtered out before
    bucketing — a doc that can't be placed on the event timeline can
    neither claim a bucket nor be judged against the horizon.

    ``timeout_mode`` is the same contract knob as
    ``near_dedupe_stream``: ``"processing"`` (default) rides the
    watermark on ARRIVAL time so a late-timestamped doc still flows
    through and gets candidates; ``"event"`` keeps the event-time
    watermark (deterministic horizon under replay, engine drops rows
    behind the watermark).

    ``max_bucket_docs`` is the streaming twin of
    ``minhash_lsh_candidates``'s cap: once a bucket has seen more than
    the bound of documents (count persisted in state, so it spans
    micro-batches within the bucket's lifetime), the bucket is treated
    as degenerate boilerplate and stops emitting candidates.  The
    kernel also stops *materializing* such a bucket: rows are consumed
    chunk-by-chunk from Arrow and the in-memory buffer is bounded by
    ``max_bucket_docs + chunk`` rows — a million-member bucket never
    lives in one pandas frame.

    ``shards``: the same throughput knob as ``near_dedupe_stream`` —
    ``applyInPandasWithState`` calls the Python kernel once per GROUP
    per micro-batch, and per-bucket grouping makes high-volume batches
    group-call-bound (~0.19 ms/call measured, SCALING.md "Round 7").
    With ``shards=N`` the stateful stage is keyed by
    ``(band, hash(band_sig) % N)`` and each shard's state is a TABLE
    of its buckets; one call serves thousands of buckets.  Candidate
    rows, first-claimant choice, the cap, and eviction timing are
    IDENTICAL to the per-bucket kernel (parity test pins them); sizing
    guidance is in ``near_dedupe_stream``'s docstring.  The memory
    contract differs in one documented way: the per-bucket kernel
    bounds a capped degenerate bucket's buffer at O(cap + chunk) rows,
    while a shard's kernel holds its partition of the micro-batch in
    one frame (the engine already materialized it per-group either
    way; per-SHARD the frame is bounded by the batch rows hashing to
    the shard, which is what N controls).

    Scale: the signature kernel is stateless and shuffle-free; the one
    exchange is the state-store partitioning on (band, band_sig) —
    identical key layout to the batch bucket join, so hot-bucket
    behavior matches batch, and executors split state linearly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from defenda_data_lake_spark.operators.dedup import banded_minhash_signatures

    if timeout_mode not in ("processing", "event"):
        raise ValueError(
            f"timeout_mode must be 'processing' or 'event'; got {timeout_mode!r}"
        )
    horizon_ms = int(pd.Timedelta(watermark_delay).total_seconds() * 1000)

    with_time = (
        docs.withColumn(
            "_lsh_event_time", F.try_to_timestamp(F.col(event_time_col))
        )
        .filter(F.col("_lsh_event_time").isNotNull())
        # epoch microseconds computed JVM-SIDE from the timestamp value
        # (timezone-exact by construction — supersedes the r5-advice
        # session-tz localization: the kernel never interprets a naive
        # wall time at all, so session timezone and DST folds/gaps
        # cannot skew the eviction math, and the per-group
        # pd.to_datetime that dominated kernel cost on tiny buckets is
        # gone)
        .withColumn("_lsh_us", F.unix_micros(F.col("_lsh_event_time")))
    )
    if timeout_mode == "event":
        with_time = with_time.withWatermark("_lsh_event_time", watermark_delay)
        with_time = with_time.withColumn("_lsh_wm_us", F.col("_lsh_us"))
        wm_cols = ["_lsh_event_time", "_lsh_us", "_lsh_wm_us"]
    else:
        # arrival-time watermark: no row can be behind it (see
        # near_dedupe_stream's timeout_mode docstring for the full
        # rationale and the probe that motivated it)
        with_time = with_time.withColumn("_lsh_arrival", F.current_timestamp())
        with_time = with_time.withWatermark("_lsh_arrival", watermark_delay)
        with_time = with_time.withColumn(
            "_lsh_wm_us", F.unix_micros(F.col("_lsh_arrival"))
        )
        wm_cols = ["_lsh_event_time", "_lsh_us", "_lsh_arrival", "_lsh_wm_us"]
    # the watermark column rides through the signature kernel as a
    # passthrough column, so the watermark survives to the stateful
    # operator without any stream-stream join-back
    banded = banded_minhash_signatures(
        with_time,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        passthrough=wm_cols,
    ).withColumnRenamed("id", "doc_id")

    def claim(key, batches, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "first_doc": pd.Series([], dtype="int64"),
                    "band": pd.Series([], dtype="int32"),
                    "band_sig": pd.Series([], dtype="str"),
                }
            )
            return
        # Consume Arrow chunks incrementally, keeping only the
        # (max_bucket_docs + 1) earliest rows buffered — when the cap
        # is unset the buffer holds everything (same as the old
        # concat), but a capped degenerate bucket stays O(cap + chunk)
        # in memory while n_total keeps the true count.
        # numpy arrays, not pandas frames: applyInPandasWithState runs
        # this function once PER BUCKET, and real batches have many
        # thousands of 1-2 member buckets — per-group pandas machinery
        # (to_datetime, sort_values, concat) measured ~5 s/micro-batch
        # of pure overhead before this rewrite
        import numpy as np

        ids_parts, us_parts = [], []
        n_total = 0
        batch_max_us = None
        keep = None if max_bucket_docs is None else max_bucket_docs + 1
        for chunk in batches:
            if len(chunk) == 0:
                continue
            n_total += len(chunk)
            chunk_us = chunk["_lsh_us"].to_numpy(dtype="int64")
            # eviction anchor lives in the WATERMARK's domain (event
            # time in event mode, arrival time in processing mode)
            chunk_max = int(chunk["_lsh_wm_us"].to_numpy(dtype="int64").max())
            if batch_max_us is None or chunk_max > batch_max_us:
                batch_max_us = chunk_max
            ids_parts.append(chunk["doc_id"].to_numpy(dtype="int64"))
            us_parts.append(chunk_us)
            if keep is not None and sum(len(a) for a in ids_parts) > keep:
                ids_all = np.concatenate(ids_parts)
                us_all = np.concatenate(us_parts)
                order = np.lexsort((ids_all, us_all))[:keep]
                ids_parts = [ids_all[order]]
                us_parts = [us_all[order]]
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        us = np.concatenate(us_parts)
        order = np.lexsort((ids, us))
        ids, us = ids[order], us[order]
        # anchor = the batch's TRUE max (recorded before the cap
        # truncated the buffer to its earliest rows — a capped flood
        # must keep pushing its timeout forward or the bucket evicts
        # mid-flood and re-emits up to cap candidates per re-claim)
        last_us = batch_max_us
        pre_existing = state.exists
        if pre_existing:
            first_doc, first_us, n_seen = state.get
        else:
            first_doc = int(ids[0])
            # the anchor lives in the WATERMARK's domain end to end —
            # seeding it from the row's EVENT time (us[0]) let a
            # future-skewed event timestamp pin the bucket's timeout at
            # that future time + horizon in processing mode, so state
            # was not bounded by the arrival horizon (ADVICE r7; the
            # near_dedupe_stream kernel always seeded from wm_max).
            # In event mode the domains coincide (batch_max_us >= every
            # event time in the batch), so this changes nothing there.
            first_us = batch_max_us
            n_seen = 0
        n_seen += n_total
        last_us = max(last_us, first_us)
        state.update((first_doc, last_us, n_seen))
        watermark_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(last_us // 1000, watermark_ms + 1) + horizon_ms
        )
        if max_bucket_docs is not None and n_seen > max_bucket_docs:
            # degenerate bucket: stop emitting (state still tracks it,
            # so it stays suppressed until the watermark evicts it)
            out_ids = ids[:0]
        elif pre_existing:
            # claimant-re-send rule (round 12): a bucket claimed in an
            # EARLIER batch emits a SELF-candidate (doc_id ==
            # first_doc) for a re-delivered claimant — downstream
            # verification sees the re-send instead of silently
            # passing it; within the claiming batch the claimant never
            # self-pairs (below)
            out_ids = ids
        else:
            out_ids = ids[ids != first_doc]
        if len(out_ids) == 0:
            return
        yield pd.DataFrame(
            {
                "doc_id": out_ids,
                "first_doc": np.full(len(out_ids), first_doc, dtype="int64"),
                "band": np.full(len(out_ids), key[0], dtype="int32"),
                "band_sig": pd.Series([key[1]] * len(out_ids), dtype="str"),
            }
        )

    def claim_sharded(key, batches, state):
        # one call serves EVERY bucket hashed to this shard, and every
        # per-bucket step is a vectorized array op over the shard's
        # columnar table (_ShardState, shared with near_dedupe_stream
        # so the two sharded kernels cannot desynchronize on eviction
        # timing); entry layout per band_sig:
        # [first_doc, anchor_us, n_seen, expiry_ms]
        import numpy as np

        tbl = _ShardState(state, ("int64", "int64", "int64", "int64"))
        if state.hasTimedOut:
            tbl.persist()
            return
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        ids = rows["doc_id"].to_numpy(dtype="int64")
        us = rows["_lsh_us"].to_numpy(dtype="int64")
        wm_us = rows["_lsh_wm_us"].to_numpy(dtype="int64")
        bsigs = rows["band_sig"].to_numpy(dtype=object)
        # one (band_sig, us, id) sort replaces the per-bucket python
        # sorts; each bucket is then a contiguous run, and the run's
        # first row is its would-be claimant
        order = np.lexsort((ids, us, bsigs))
        bs_s, ids_s, wm_s = bsigs[order], ids[order], wm_us[order]
        n = len(bs_s)
        starts = np.flatnonzero(np.r_[True, bs_s[1:] != bs_s[:-1]])
        counts = np.diff(np.r_[starts, n])
        uniq = bs_s[starts]
        wm_max = np.maximum.reduceat(wm_s, starts)
        # anchor seeded in the WATERMARK's domain, like the per-bucket
        # kernel (event-time seeding would pin a future-skewed bucket
        # past the arrival horizon in processing mode — ADVICE r7)
        zeros = np.zeros(len(uniq), dtype="int64")
        gidx, fresh = tbl.lookup_or_append(
            uniq, (ids_s[starts], wm_max, zeros, zeros)
        )
        firsts, anchors, n_seens, expiries = tbl.cols
        anchors[gidx] = np.maximum(anchors[gidx], wm_max)
        n_seens[gidx] += counts
        # same formula the per-bucket kernel feeds to
        # setTimeoutTimestamp at each data batch
        expiries[gidx] = (
            np.maximum(anchors[gidx] // 1000, tbl.wm_ms + 1) + horizon_ms
        )
        capped = (
            np.zeros(len(uniq), dtype=bool)
            if max_bucket_docs is None
            else n_seens[gidx] > max_bucket_docs
        )
        group_of_row = np.repeat(np.arange(len(uniq)), counts)
        first_per_row = firsts[gidx][group_of_row]
        # claimant-re-send rule (round 12, mirrors the per-bucket
        # kernel): the claimant-id exemption holds only while the
        # bucket is claimed THIS batch; a pre-existing bucket emits a
        # SELF-candidate (doc_id == first_doc) for a re-delivered
        # claimant so downstream consumers can suppress the re-send
        emit = ~np.repeat(capped, counts) & (
            (ids_s != first_per_row) | np.repeat(~fresh, counts)
        )
        tbl.persist(touched_idx=gidx)
        if not emit.any():
            return
        yield pd.DataFrame(
            {
                "doc_id": ids_s[emit],
                "first_doc": first_per_row[emit],
                "band": np.full(int(emit.sum()), key[0], dtype="int32"),
                "band_sig": pd.Series(bs_s[emit], dtype="str"),
            }
        )

    if shards is None:
        return banded.groupBy("band", "band_sig").applyInPandasWithState(
            claim,
            outputStructType=LSH_CANDIDATE_SCHEMA,
            stateStructType=_LSH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    sharded = banded.withColumn(
        "_lsh_shard",
        F.pmod(F.xxhash64(F.col("band_sig")), F.lit(shards)).cast("int"),
    )
    return sharded.groupBy("band", "_lsh_shard").applyInPandasWithState(
        claim_sharded,
        outputStructType=LSH_CANDIDATE_SCHEMA,
        stateStructType=_SHARD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _predrop_key_expr(id_col: str, text_col: str):
    """The exact-predrop dedup key (see ``near_dedupe_stream``'s
    ``exact_predrop``): EVERY row keys on its (id, text) pair, hashed
    PER FIELD to fixed-width digests — an INJECTIVE combination (a
    raw separator-joined concat is ambiguous when id/text contain the
    separator byte, which would collapse two DISTINCT rows into one
    key and silently suppress a unique row — review fix, round 11).
    NULL id/text coalesce to non-hex sentinels AFTER their md5, so
    they cannot collide with any real 32-hex digest (dropDuplicates
    treats NULL keys as EQUAL — an un-coalesced NULL would merge
    every NULL-id row).

    Round-12 contract narrowing (ADVICE r11): dedup-participating
    rows used to key on their kernel TEXT alone, which suppressed —
    with no quarantine/audit record — any DISTINCT event that merely
    shared text with an earlier one, a loss contract wider than the
    stated motivation (byte-identical transport re-sends).  Keying on
    (id, text) everywhere still suppresses byte-identical re-sends
    (same bytes ⇒ same id AND text) and still prevents the claimant
    double-landing for payload-carried ids, while a distinct
    same-text event now flows through to the main stage and lands in
    the quarantine WITH its ``dup_of`` audit record, exactly as the
    operator's documented contract promises.  (Re-sends whose ids
    are minted per-delivery — no id in the payload — no longer match
    here either; the default-path claimant-re-send guard in the
    stateful kernel covers those by agreement.)  One formula for both
    the participating and bypass arms, so the injectivity property is
    directly testable on batch frames
    (tests/test_streaming_dedup.py)."""
    text_s = F.col(text_col).cast("string")
    return F.md5(
        F.concat(
            F.coalesce(
                F.md5(F.col(id_col).cast("string")),
                F.lit("<null-id>"),
            ),
            F.coalesce(F.md5(text_s), F.lit("<null-text>")),
        )
    )


def near_dedupe_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str = "event_time",
    watermark_delay: str = "1 hour",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    min_hash_agreement: float = 0.5,
    max_bucket_docs: int | None = None,
    timeout_mode: str = "processing",
    shards: int | None = None,
    signature_kernel: str = "pandas",
    exact_predrop: bool = False,
    external_watermark: str | None = None,
) -> DataFrame:
    """End-to-end streaming near-dedup: candidates AND verification in
    one stateful pass — the streaming twin of
    ``operators.dedup.minhash_bucket_dedupe`` (a pinned parity test
    keeps them in lockstep).  Emits every input row ``bands`` times,
    each with a ``dup_of`` column: the bucket claimant's id (as a
    string) when the row's FULL minhash signature agrees with the
    claimant's on ≥ ``min_hash_agreement`` of the hash families, else
    NULL.  Reduce to one verdict per document with
    :func:`resolve_stream_flags` (inside ``foreachBatch``, where the
    micro-batch is a plain DataFrame).

    ``signature_kernel``: ``"pandas"`` (incumbent Arrow kernel) or
    ``"sql"`` (the pure-JVM twin, bit-identical signatures — see
    ``_minhash_signatures_sql``); measured A/B in SCALING.md
    "Round 10".

    ``exact_predrop`` (streaming only; default off to keep the
    established output contract and checkpoint compatibility): insert
    a pure-JVM ``dropDuplicatesWithinWatermark`` keyed on an
    injective (id, text) digest BEFORE the signature kernel —
    (id, text)-identical re-sends (byte-identical transport re-sends
    being the motivating case) are suppressed in-stream and stop
    paying the Python signature + stateful stages at all (measured in
    SCALING.md "Round 11"/"Round 12").  PRECISE contract when on
    (key narrowed round 12, ADVICE r11): EVERY row keys on its
    (id, text) pair — a DISTINCT event that merely shares text with
    an earlier one is NOT suppressed here; it flows to the main stage,
    is flagged ``dup_of``, and lands in the quarantine with its audit
    record (the round-11 text-only key silently discarded it).
    Distinct ids/texts can never collide (fixed-width md5-per-field),
    so the no-row-lost invariant for unique rows holds exactly.
    CHECKPOINT NOTE (review fix, round 12): the key FORMULA changed
    between rounds 11 and 12 with no state-schema change, so Spark
    would silently resume a round-11 predrop checkpoint whose stored
    text-keys can never match the new (id, text) keys — re-admitting
    already-seen re-sends for up to one horizon.  A predrop stream
    upgraded across this change must restart on a FRESH checkpoint
    (optionally seeded via :func:`seed_near_dedup_state`).  In
    ``timeout_mode='event'`` the pre-drop covers only
    event-time-parseable rows: timeless rows ride the union around
    the watermark (they cannot pass one), so their re-sends are NOT
    suppressed in that mode — consistent with event mode's premise
    (replay jobs where late/timeless re-delivery is impossible by
    construction).

    Claimant re-sends (round 12, VERDICT r11 item 1 — DEFAULT-path
    behavior, no flag needed): the ``doc_id == first_id`` exemption
    applies only while a bucket is being claimed in the CURRENT
    micro-batch (in-batch copies collapse to one landed row via
    :func:`resolve_stream_flags`'s per-id reduction).  Once a bucket
    pre-exists, a row carrying the claimant's own id is judged by
    signature agreement like any other row, so a byte-identical
    re-delivery of the claimant resolves ``dup_of = first_id`` (its
    own id) and is routed to the quarantine — flag-at-resolve,
    preserving the quarantine contract — instead of silently landing
    a second time.  Remaining documented exception: BYPASS rows
    (timeless / unshingleable) survive unconditionally by design, so
    their exact re-sends still double-land on the default path;
    ``exact_predrop=True`` covers them.

    Why verify against the CLAIMANT only: exact pairwise verification
    needs both documents' contents, and the earlier document lives in
    a previous micro-batch — storing full texts in state is unbounded.
    The claimant's signature is ~``num_hashes``·8 hex chars, so state
    stays two longs + two small strings per bucket, evicted by the
    same event-time TTL as ``lsh_candidates_stream``.  Signature
    agreement IS the MinHash estimator of Jaccard similarity, so the
    verdict is principled, deterministic, and exactly replayable in
    batch SQL (the q77 oracle replays it).

    Claimant order: (event time, id-as-string) WITHIN a micro-batch
    (string order so the state store and every engine replaying the
    oracle compare ids identically); ACROSS micro-batches the claimant
    is first-arrival — a stream cannot retract verdicts already
    emitted, so a later batch delivering an earlier-timestamped doc
    does not unseat the stored claimant.  Batch parity with
    ``minhash_bucket_dedupe`` therefore holds exactly when arrival
    order respects event time (the pinned parity test's contract);
    out-of-order delivery can flip which member of a near-dup set
    survives — the SET of surviving contents is equivalent either way.

    ``timeout_mode`` picks how bucket state is evicted, and with it
    the late-row contract:

    - ``"processing"`` (default): the watermark is registered on the
      row's ARRIVAL time (the micro-batch timestamp) instead of the
      event's own time, so no row can ever be behind it and the engine
      never discards one — the only mode that upholds the no-row-lost
      invariant below — while the same event-time-timeout machinery
      still evicts a bucket one ``watermark_delay`` of arrival time
      after its last activity (state stays bounded by
      buckets-per-horizon).  The natural contract for ingest:
      at-least-once transports redeliver within wall-clock minutes,
      and an event that shows up a day late must still LAND (possibly
      undeduplicated), never vanish.  The round-7 500k-event probe
      measured the alternative: with an event-time watermark, 239k of
      500k events whose timestamps wrapped behind the watermark were
      silently dropped by the stateful operator.
    - ``"event"``: the round-6 behavior — event-time watermark +
      event-time timeout.  State and DEDUP COVERAGE are bounded in
      event time (deterministic under replay of a historical corpus:
      eviction depends only on the data, not on how fast the replay
      runs), at the documented Spark cost that rows older than the
      watermark are dropped before the stateful stage.  Use for
      reprocessing jobs where event-time determinism matters and
      late data is impossible by construction.

    NO ROW IS EVER LOST (``timeout_mode="processing"``) — the
    invariant an ingest stage must hold.  In ``timeout_mode="event"``
    the guarantee is WEAKER for one class of row: unshingleable rows
    carry their own event time through the stateful operator (band=-1),
    so one that arrives behind the event-time watermark is dropped by
    the engine exactly like a late shingleable row — that is this
    mode's documented contract ("late data is impossible by
    construction" is the operator's premise), and the drop is auditable
    via :func:`watermark_drop_counts`.  Routing them around the
    operator instead would need a second signature-kernel pass on a
    union branch — the exact 3x-scan shape the round-8 single-pass
    rework removed.  Only timeless rows (no parseable event time, so
    no time for the watermark to judge) bypass the operator in event
    mode and survive unconditionally.  In processing mode, documents
    that cannot participate in dedup survive unconditionally (one
    band-0 row, ``dup_of`` NULL): rows without a parseable event time
    (can
    neither claim a bucket nor be judged against the horizon — and a
    quarantine-bound record with no timestamp must still reach the
    quarantine), and rows whose text yields no shingles.  Such rows
    ride the SAME single-pass plan as everything else, keyed
    ``(band=-1, band_sig=<doc id>)`` so the stateful kernels emit
    them verbatim without touching state — NOT a separate union
    branch: a streaming self-union executes every branch per
    micro-batch, and the old three-branch shape ran the source scan
    and normalize three times and the signature kernel twice (the
    round-8 probe measured it at 3x input rows).  The no-shingle
    decision is still made BY the signature kernel
    (``keep_unshingleable=True`` → NULL-signature rows become
    band=-1): Python's unicode whitespace rules decide
    shingleability, and no Spark-side predicate reproduces them
    exactly — a tab-only document under a trim()-based check would be
    dropped by the kernel yet miss the bypass, silently destroying
    the row.  ``max_bucket_docs``: once a bucket's cumulative
    membership exceeds the cap it stops flagging (rows still flow
    through).

    ``shards``: the throughput knob.  ``applyInPandasWithState``
    invokes the Python kernel once per GROUP per micro-batch, and with
    per-bucket grouping a 125k-event batch means ~250k kernel calls at
    ~0.19 ms each — the round-7 probe measured the stage
    group-call-bound at 2.4k events/s while the state math itself is
    microseconds.  With ``shards=N`` the stateful stage is keyed by
    ``(band, hash(band_sig) % N)`` instead of ``(band, band_sig)``,
    and each shard's state holds a TABLE of its buckets (parallel
    arrays of (band_sig, claimant, anchor, n_seen, claimant_sig));
    one kernel call then serves thousands of buckets.  Verdicts,
    claimant order, the cap, and eviction timing are IDENTICAL to the
    per-bucket kernel (a parity test pins them row-for-row): per-entry
    expiry inside the shard mirrors the engine's end-of-batch timeout
    semantics — an entry expired relative to the current watermark is
    pruned only if this batch brought it no rows, exactly when the
    engine would have fired the per-bucket timeout.  The trade is
    state-serialization granularity: every touched shard rewrites its
    whole table per batch, so pick N high enough that shard tables
    stay small (buckets-per-horizon / N entries) and low enough that
    calls stay amortized.  Size it to the DEPLOYMENT, not a constant:
    N ≈ buckets-per-horizon / 5k keeps tables in the KB-MB range, and
    ``bands * N`` is the stateful stage's maximum parallelism, so N
    must also comfortably exceed total executor cores — 64-1024 fits
    a single node (the 500k probe uses 256); a 100 TB/day cluster
    with billions of horizon buckets wants N in the 10^5-10^6 range.
    None keeps the per-bucket reference kernel.

    ``external_watermark`` (processing mode only): the name of an
    ARRIVAL-TIME column the caller already watermarked upstream —
    Spark disallows redefining a watermark on a linear chain, so this
    operator must not call ``withWatermark`` again; instead the named
    column (whose attribute metadata carries the watermark tag)
    becomes the operator's ``_ndd_arrival`` and is excluded from the
    payload.  Used by ``start_deduped_ingest``'s raw-level exact
    pre-drop, whose ``dropDuplicatesWithinWatermark`` on the raw line
    needs the one watermark BEFORE normalization.  The upstream
    column is ``current_timestamp()`` — the same micro-batch
    timestamp this operator would have stamped — so eviction timing
    is unchanged; only the watermark NODE placement moves."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from defenda_data_lake_spark.operators.dedup import (
        band_structs_expr,
        minhash_signatures,
    )

    if timeout_mode not in ("processing", "event"):
        raise ValueError(f"timeout_mode must be 'processing' or 'event'; got {timeout_mode!r}")
    timeout_event = timeout_mode == "event"
    if external_watermark and timeout_event:
        raise ValueError(
            "external_watermark only composes with timeout_mode="
            "'processing' (an upstream ARRIVAL watermark cannot bound "
            "event-time state)"
        )
    if external_watermark and external_watermark not in docs.columns:
        raise ValueError(
            f"external_watermark column {external_watermark!r} not in input"
        )
    horizon_ms = int(pd.Timedelta(watermark_delay).total_seconds() * 1000)
    payload_cols = [c for c in docs.columns if c != external_watermark]
    other_cols = [c for c in payload_cols if c != id_col]
    # ------------------------------------------------------------------
    # Payload packing (round 8): the per-group Arrow->pandas conversion
    # inside applyInPandasWithState is paid PER GROUP SLICE PER COLUMN
    # (pyspark serializers.py gen_data_and_state) — with 512 shard
    # groups and a 13-column event payload the stateful stage performed
    # ~8.7k column conversions per micro-batch, and the round-8 profile
    # measured that input materialization at 29 s of the 500k probe's
    # Python time while the state math itself was 9 s.  So the payload
    # crosses the stateful stage as ONE internal JSON string column
    # (to_json before the signature kernel, from_json + unpack after
    # the stateful stage — both JVM codegen), restoring the public
    # output schema exactly.  Packing is gated on a type whitelist with
    # exact JSON round-trip (strings, integers, booleans, and
    # arrays/structs/string-keyed maps of those); payloads with floats,
    # timestamps, decimals, or binary keep the unpacked path — JSON
    # formatting of those types is not bit-faithful.
    # ------------------------------------------------------------------
    packed = (
        bool(other_cols)
        and "_ndd_payload" not in payload_cols
        and all(
            _json_roundtrips(f.dataType)
            for f in docs.schema.fields
            if f.name != id_col and f.name != external_watermark
        )
    )
    kernel_payload = ["_ndd_payload"] if packed else other_cols
    hs = [f"h{i}" for i in range(num_hashes)]

    with_time = docs.withColumn(
        "_ndd_event_time", F.try_to_timestamp(F.col(event_time_col))
    )
    # ------------------------------------------------------------------
    # Plan shape by mode (round-8 single-pass rework): in processing
    # mode the WHOLE stream is ONE pass — every row, including rows
    # with no parseable event time and rows whose text yields no
    # shingles, rides the same plan into the stateful stage, where
    # bypass rows are keyed (band=-1, band_sig=<doc id>) and the
    # kernels emit them verbatim without touching state.  The previous
    # shape unioned three branches (stateful + timeless +
    # unshingleable) off one source, and a streaming self-union
    # EXECUTES EVERY BRANCH per micro-batch: the round-8 probe
    # measured numInputRows at 3x the batch size — the file scan and
    # the Arrow-batched normalize stage ran three times and the
    # signature kernel twice per batch, and THAT (not the state
    # kernel) dominated end-to-end ingest throughput.  Event mode
    # keeps a union for the timeless rows only: a NULL event time
    # cannot pass an event-time watermark (the engine would drop the
    # row at the stateful operator), so those rows must go around it.
    # ------------------------------------------------------------------
    # epoch micros computed JVM-side (unix_micros): timezone-exact by
    # construction, and the kernel never touches pandas datetime — the
    # per-bucket to_datetime cost and the naive-wall-time/DST hazards
    # both disappear
    base = (
        with_time.filter(F.col("_ndd_event_time").isNotNull())
        if timeout_event
        else with_time
    )
    timed = base.withColumn(
        "_ndd_us", F.unix_micros(F.col("_ndd_event_time"))
    )
    if timeout_event:
        # event mode: the watermark rides the event's OWN time — the
        # engine DROPS rows behind it at the stateful operator, the
        # documented contract of this mode
        timed = timed.withWatermark("_ndd_event_time", watermark_delay)
        timed = timed.withColumn("_ndd_wm_us", F.col("_ndd_us"))
    else:
        # processing mode: the watermark rides the ARRIVAL time
        # (current_timestamp() = the micro-batch timestamp, constant
        # within a batch and monotone across batches), so no row can
        # ever be behind it — nothing is dropped — while the SAME
        # event-time-timeout machinery still evicts idle buckets one
        # horizon of arrival time after their last activity.  A plain
        # ProcessingTimeTimeout (no watermark) was tried first and
        # rejected: it makes the engine trigger continuous empty
        # micro-batches to service timers, burning a core per idle
        # stream and never letting processAllAvailable return.
        if external_watermark:
            # the upstream watermark-tagged arrival column becomes
            # _ndd_arrival (rename preserves attribute metadata, so
            # the tag reaches the stateful operator through the
            # signature kernel's verbatim passthrough fields)
            timed = timed.withColumnRenamed(external_watermark, "_ndd_arrival")
        else:
            timed = timed.withColumn("_ndd_arrival", F.current_timestamp())
            timed = timed.withWatermark("_ndd_arrival", watermark_delay)
        timed = timed.withColumn("_ndd_wm_us", F.unix_micros(F.col("_ndd_arrival")))
    wm_cols = ["_ndd_event_time", "_ndd_us", "_ndd_wm_us"] + (
        [] if timeout_event else ["_ndd_arrival"]
    )

    if exact_predrop and docs.isStreaming:
        # ------------------------------------------------------------------
        # JVM exact pre-drop (round 11; key narrowed round 12 per
        # ADVICE r11): suppress (id, text)-identical re-deliveries
        # BEFORE the Python stages.  At-least-once transports re-send
        # the same bytes; every such re-send otherwise pays the full
        # signature-kernel + stateful-kernel cost.  One
        # `dropDuplicatesWithinWatermark` keyed on an injective
        # (id, text) digest — pure JVM, chained legally with the
        # downstream applyInPandasWithState under the single watermark
        # defined above (Spark allows multiple stateful operators in
        # append mode; REdefining the watermark is what's disallowed).
        # EVERY row — participating or bypass — keys on (id, text): a
        # re-send of the same row is a true duplicate and is
        # suppressed, DISTINCT rows can never collide (the no-row-lost
        # invariant for unique rows holds exactly), and a distinct
        # same-text event flows through to the main stage where it is
        # flagged dup_of and lands in the quarantine WITH its audit
        # record (the round-11 text-only key suppressed it silently —
        # a wider loss contract than the byte-identical motivation).
        # State: one 32-hex string per distinct key per horizon,
        # evicted by the same watermark as the main stage.
        # ------------------------------------------------------------------
        timed = (
            timed.withColumn("_ndd_xh", _predrop_key_expr(id_col, text_col))
            .dropDuplicatesWithinWatermark(["_ndd_xh"])
            .drop("_ndd_xh")
        )

    if packed:
        timed = timed.withColumn(
            "_ndd_payload",
            F.to_json(F.struct(*[F.col(c) for c in other_cols])),
        )
    sigs = minhash_signatures(
        timed,
        text_col,
        id_col,
        num_hashes,
        shingle_n,
        passthrough=wm_cols + kernel_payload,
        keep_unshingleable=True,
        kernel=signature_kernel,
    )
    band_structs = band_structs_expr(hs, bands)
    id_str = F.col("id").cast("string")
    # bypass rows stay IN the single pass: one (band=-1, band_sig=id)
    # row each — the id key spreads them across shards, and the kernels
    # pass them through without touching state.  _ndd_us is NULL only
    # for timeless rows in processing mode; those are bypass by
    # definition, so the coalesce below never reaches a bucket sort.
    bypass = F.col("h0").isNull() | F.col("_ndd_us").isNull()
    bands_arr = F.when(
        bypass,
        F.array(
            F.struct(
                F.lit(-1).cast("int").alias("band"),
                id_str.alias("band_sig"),
            )
        ),
    ).otherwise(band_structs)
    wm_sel = [
        F.coalesce(F.col(c), F.lit(0)).alias(c) if c == "_ndd_us" else F.col(c)
        for c in wm_cols
    ]
    # note: shipping the payload on only the band-0 row (typed NULLs on
    # the other bands, reassembled by a first-ignorenulls resolve) was
    # tried here and REVERTED — at realistic event sizes the payload
    # bytes saved did not pay for the per-column CASE projection and
    # the null-heavy Arrow columns (clean-box probe: 42-58 s vs 32 s
    # for 500k events; SCALING.md "Round 8")
    banded = sigs.select(
        id_str.alias("_ndd_id"),
        F.concat_ws("|", *hs).alias("_ndd_sig"),
        *wm_sel,
        *kernel_payload,
        F.explode(bands_arr).alias("bs"),
    ).select(
        "_ndd_id", "_ndd_sig", *wm_cols,
        *kernel_payload,
        "bs.band", "bs.band_sig",
    )

    if packed:
        out_schema = "_ndd_id string, band int, dup_of string, _ndd_payload string"
    else:
        out_fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in docs.schema.fields
            if f.name != id_col and f.name != external_watermark
        )
        out_schema = (
            f"_ndd_id string, band int, dup_of string"
            + (f", {out_fields}" if out_fields else "")
        )
    n_fam = float(num_hashes)

    min_agree_count = min_hash_agreement * n_fam

    def bypass_rows(batches):
        # band=-1 group: no parseable event time or no shingles — emit
        # verbatim as band-0 survivor rows (the no-row-lost invariant),
        # never touch state, never register a timeout
        for chunk in batches:
            if not len(chunk):
                continue
            yield pd.DataFrame(
                {
                    "_ndd_id": chunk["_ndd_id"],
                    "band": pd.Series([0] * len(chunk), dtype="int32"),
                    "dup_of": pd.Series([None] * len(chunk), dtype=object),
                    **{c: chunk[c] for c in kernel_payload},
                }
            )

    def claim(key, batches, state):
        if key[0] == -1:
            yield from bypass_rows(batches)
            return
        if state.hasTimedOut:
            state.remove()
            return
        # per-BUCKET function on mostly 1-2 member buckets: stay on
        # python lists/numpy, sort by the JVM-computed epoch micros —
        # per-group pandas datetime/sort machinery measured ~5 s of
        # pure overhead per 10k-doc micro-batch before this shape
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        ids = rows["_ndd_id"].to_list()
        sigs_l = rows["_ndd_sig"].to_list()
        us = rows["_ndd_us"].to_list()
        # timeout anchor lives in the WATERMARK's domain (event time in
        # event mode, arrival time in processing mode) — max over the
        # batch, carried forward through state
        wm_max = int(max(rows["_ndd_wm_us"].to_list()))
        if len(ids) > 1:
            order = sorted(range(len(ids)), key=lambda i: (us[i], ids[i]))
            ids = [ids[i] for i in order]
            sigs_l = [sigs_l[i] for i in order]
        else:
            order = [0]
        # pre_existing: the bucket was claimed in an EARLIER micro-batch.
        # Claimant-re-send guard (round 12, VERDICT r11 item 1): the
        # `doc_id == first_id` exemption only applies while the bucket
        # is being claimed THIS batch — in-batch copies of the claimant
        # stay exempt because resolve_stream_flags collapses them by id
        # (the id lands exactly once; flagging a copy would quarantine
        # the whole id).  Once the bucket pre-exists, a row carrying
        # the claimant's own id is a re-delivery and is judged by
        # signature agreement like any other row, so a byte-identical
        # re-send resolves `dup_of = first_id` (its own id) and lands
        # in the QUARANTINE with its audit record instead of silently
        # landing in the events table a second time — flag-at-resolve,
        # preserving the quarantine contract.
        pre_existing = state.exists
        if pre_existing:
            first_id, anchor_us, n_seen, first_sig = state.get
        else:
            first_id = str(ids[0])
            anchor_us = wm_max
            n_seen = 0
            first_sig = str(sigs_l[0])
        n_seen += len(ids)
        anchor_us = max(wm_max, anchor_us)
        state.update((first_id, anchor_us, n_seen, first_sig))
        watermark_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(anchor_us // 1000, watermark_ms + 1) + horizon_ms
        )
        capped = max_bucket_docs is not None and n_seen > max_bucket_docs
        c_parts = first_sig.split("|")

        def verdict(doc_id: str, sig: str) -> str | None:
            if capped or (doc_id == first_id and not pre_existing):
                return None
            agree = sum(
                a == b for a, b in zip(sig.split("|"), c_parts)
            )
            return first_id if agree >= min_agree_count else None

        out = pd.DataFrame(
            {
                "_ndd_id": ids,
                "band": pd.Series([key[0]] * len(ids), dtype="int32"),
                "dup_of": [verdict(i, s) for i, s in zip(ids, sigs_l)],
                **{
                    c: rows[c].to_numpy(dtype=object)[order]
                    for c in kernel_payload
                },
            }
        )
        yield out

    def claim_sharded(key, batches, state):
        # one call serves EVERY bucket hashed to this shard, with every
        # per-bucket step vectorized over the shard's columnar table
        # (_ShardState, shared with lsh_candidates_stream); entry
        # layout per band_sig:
        # [first_id, anchor_us, n_seen, first_sig, expiry_ms]
        import numpy as np

        if key[0] == -1:
            yield from bypass_rows(batches)
            return
        tbl = _ShardState(
            state, ("object", "int64", "int64", "object", "int64")
        )
        if state.hasTimedOut:
            tbl.persist()
            return
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        ids = rows["_ndd_id"].to_numpy(dtype=object)
        sigs_arr = rows["_ndd_sig"].to_numpy(dtype=object)
        us = rows["_ndd_us"].to_numpy(dtype="int64")
        wm_us = rows["_ndd_wm_us"].to_numpy(dtype="int64")
        bsigs = rows["band_sig"].to_numpy(dtype=object)
        # one (band_sig, us, id) sort; each bucket is a contiguous run
        # whose first row is its would-be claimant (id compared as a
        # STRING, same as the state store — see the docstring)
        order = np.lexsort((ids, us, bsigs))
        bs_s, ids_s, sigs_s, wm_s = (
            bsigs[order], ids[order], sigs_arr[order], wm_us[order]
        )
        n = len(bs_s)
        starts = np.flatnonzero(np.r_[True, bs_s[1:] != bs_s[:-1]])
        counts = np.diff(np.r_[starts, n])
        uniq = bs_s[starts]
        wm_max = np.maximum.reduceat(wm_s, starts)
        zeros = np.zeros(len(uniq), dtype="int64")
        gidx, fresh = tbl.lookup_or_append(
            uniq, (ids_s[starts], wm_max, zeros, sigs_s[starts], zeros)
        )
        firsts, anchors, n_seens, fsigs, expiries = tbl.cols
        anchors[gidx] = np.maximum(anchors[gidx], wm_max)
        n_seens[gidx] += counts
        # same formula the per-bucket kernel feeds to
        # setTimeoutTimestamp at each data batch
        expiries[gidx] = (
            np.maximum(anchors[gidx] // 1000, tbl.wm_ms + 1) + horizon_ms
        )
        capped = (
            np.zeros(len(uniq), dtype=bool)
            if max_bucket_docs is None
            else n_seens[gidx] > max_bucket_docs
        )
        group_of_row = np.repeat(np.arange(len(uniq)), counts)
        first_per_row = firsts[gidx][group_of_row]
        # minhash agreement, vectorized: split row and claimant sigs
        # into (rows x num_hashes) token matrices and count per-family
        # equality — the estimator the per-bucket verdict() computes
        # row-at-a-time
        row_mat = pd.Series(sigs_s).str.split("|", expand=True).to_numpy()
        claim_mat = (
            pd.Series(fsigs[gidx]).str.split("|", expand=True).to_numpy()
        )[group_of_row]
        agree = (row_mat == claim_mat).sum(axis=1)
        # claimant-re-send guard (round 12, mirrors the per-bucket
        # kernel's pre_existing rule): the claimant-id exemption holds
        # only while the bucket is claimed THIS batch; once it
        # pre-exists, a row carrying the claimant's own id is judged
        # by agreement like any other row, so a byte-identical re-send
        # resolves dup_of = its own id and is quarantined instead of
        # double-landing
        is_dup = (
            ~np.repeat(capped, counts)
            & ((ids_s != first_per_row) | np.repeat(~fresh, counts))
            & (agree >= min_agree_count)
        )
        dup_sorted = np.where(is_dup, first_per_row, None)
        # scatter verdicts back to the batch's original row order (the
        # payload columns below are emitted unsorted)
        dup_of = np.empty(len(ids), dtype=object)
        dup_of[order] = dup_sorted
        tbl.persist(touched_idx=gidx)
        yield pd.DataFrame(
            {
                "_ndd_id": ids,
                "band": pd.Series([key[0]] * len(ids), dtype="int32"),
                "dup_of": dup_of,
                **{c: rows[c].to_numpy(dtype=object) for c in kernel_payload},
            }
        )

    if shards is None:
        flagged = banded.groupBy("band", "band_sig").applyInPandasWithState(
            claim,
            outputStructType=out_schema,
            stateStructType="first_id string, first_us long, n_seen long, first_sig string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    else:
        sharded = banded.withColumn(
            "_ndd_shard",
            F.pmod(F.xxhash64(F.col("band_sig")), F.lit(shards)).cast("int"),
        )
        flagged = sharded.groupBy("band", "_ndd_shard").applyInPandasWithState(
            claim_sharded,
            outputStructType=out_schema,
            stateStructType=_SHARD_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    if packed:
        # restore the public output schema: one from_json + field
        # unpack, both JVM codegen on the stateful stage's OUTPUT
        from pyspark.sql import types as T

        payload_type = T.StructType(
            [
                f
                for f in docs.schema.fields
                if f.name != id_col and f.name != external_watermark
            ]
        )
        flagged = flagged.withColumn(
            "_ndd_p", F.from_json(F.col("_ndd_payload"), payload_type)
        ).select(
            "_ndd_id",
            "band",
            "dup_of",
            *[F.col("_ndd_p").getField(c).alias(c) for c in other_cols],
        )
    if not timeout_event:
        # processing mode: bypass rows (timeless AND unshingleable)
        # already rode the single pass as band=-1 groups — one plan,
        # one source scan, one normalize, one signature kernel
        return flagged
    # event mode: unshingleable rows rode the single pass too (they
    # have event times), so a LATE unshingleable row is dropped by the
    # event-time watermark like any other late row — the mode's
    # documented contract; see the class-docstring NO-ROW-LOST section
    # and watermark_drop_counts for the audit trail.  Rows with no
    # parseable event time cannot pass the event-time watermark at all
    # (the engine would drop every one at the stateful operator), so
    # they go around it (the one remaining union branch; the re-scan
    # it costs is confined to replay mode)
    timeless = with_time.filter(F.col("_ndd_event_time").isNull()).select(
        F.col(id_col).cast("string").alias("_ndd_id"),
        F.lit(0).cast("int").alias("band"),
        F.lit(None).cast("string").alias("dup_of"),
        *[F.col(c) for c in other_cols],
    )
    return flagged.unionByName(timeless)


def resolve_stream_flags(batch_df: DataFrame, id_col: str = "_ndd_id") -> DataFrame:
    """Reduce ``near_dedupe_stream``'s per-band rows to one verdict per
    document (min non-NULL claimant wins; NULL = survivor).  Meant for
    the micro-batch DataFrame inside ``foreachBatch`` — the per-band
    rows of one document always share a micro-batch, because the
    stateful kernel processes both band rows in the batch that
    delivered them."""
    other = [c for c in batch_df.columns if c not in (id_col, "band", "dup_of")]

    def agg_for(c):
        # the migration-seed marker must resolve deterministically when
        # a live redelivery shares its id with a seed row in the same
        # micro-batch: ANY seed copy means the id already landed before
        # the migration, so the whole doc resolves as seed and the
        # sink's drop-seed-rows rule suppresses the redelivery —
        # F.first() would pick a nondeterministic row and either
        # double-land or silently split the verdict
        if c == "_ndd_seed":
            return F.max(c).alias(c)
        return F.first(c).alias(c)

    return batch_df.groupBy(id_col).agg(
        *[agg_for(c) for c in other],
        F.min("dup_of").alias("dup_of"),
    )


def seed_near_dedup_state(
    spark,
    history: DataFrame,
    seed_dir: str,
    live: DataFrame,
) -> DataFrame:
    """Compose a near-dedup input stream whose stateful stage REBUILDS
    its per-bucket state from already-landed rows — the documented
    migration path when a checkpoint's state schema can no longer
    resume on current code (``_LSH_STATE_SCHEMA`` v1 -> v2): start the
    query on a FRESH checkpoint over this seeded stream instead of the
    bare live stream, and the first micro-batches replay the last
    watermark horizon's documents through the same kernel, re-claiming
    every bucket a plain restart would have forgotten.

    ``history`` is a BATCH DataFrame of the horizon's already-processed
    documents (e.g. the events table filtered to ``utctimestamp >=
    watermark - delay``) with the SAME columns as ``live``.  It is
    written once to ``seed_dir`` as parquet (type-exact round-trip) and
    read back as a file stream, because a batch frame cannot union with
    a streaming one.  Every row gains an ``_ndd_seed`` boolean that
    rides through :func:`near_dedupe_stream` as a payload column: seed
    rows DO claim buckets and DO get verdicts re-emitted, so the sink
    must drop ``_ndd_seed`` rows after :func:`resolve_stream_flags`
    (they already landed before the migration) — state rebuild without
    double-landing, and in-horizon duplicates arriving after the
    migration still resolve against pre-migration claimants.  If a
    LIVE redelivery of a seeded id arrives in the same micro-batch as
    its seed copy, the id resolves as seed (``resolve_stream_flags``
    aggregates ``_ndd_seed`` with ``max``: any seed copy wins) and the
    redelivery is suppressed — the event already landed, which is the
    exact outcome dedup exists to produce.

    Scale: the seed is one horizon of data partitioned like any other
    file-source micro-batch sequence; the rebuild costs exactly one
    replay of the horizon, after which the seed directory is dead
    weight and can be deleted."""
    if "_ndd_seed" in history.columns or "_ndd_seed" in live.columns:
        raise ValueError("_ndd_seed is reserved for the migration seed")
    if set(history.columns) != set(live.columns):
        raise ValueError(
            "history and live must share columns; got "
            f"{sorted(history.columns)} vs {sorted(live.columns)}"
        )
    seeded = history.withColumn("_ndd_seed", F.lit(True))
    seeded.write.mode("overwrite").parquet(seed_dir)
    seed_stream = spark.readStream.schema(seeded.schema).parquet(seed_dir)
    return live.withColumn("_ndd_seed", F.lit(False)).unionByName(seed_stream)


def watermark_drop_counts(query) -> int:
    """Total input rows the ENGINE silently discarded for arriving
    behind the event-time watermark, summed over the query's retained
    progress history — the audit surface for ``timeout_mode="event"``
    (VERDICT r7: event mode drops late rows by documented Spark
    semantics, but the loss was invisible to an operator).  Sums
    ``stateOperators[].numRowsDroppedByWatermark`` from
    ``query.recentProgress``; in ``timeout_mode="processing"`` (the
    default) this is 0 by construction — no row can be behind an
    arrival-time watermark.

    UNIT: stateful-stage input rows, which for ``near_dedupe_stream``
    is ``bands`` rows per document (the drop happens AFTER the band
    explode) — divide by ``bands`` for a document count; pinned by the
    late-row regression test.

    Scope caveat: ``recentProgress`` retains the last
    ``spark.sql.streaming.numRecentProgressUpdates`` micro-batches
    (default 100).  A long-running replay that must account for every
    drop should attach a ``StreamingQueryListener`` and accumulate the
    same field per progress event; this helper is the
    probe/post-run-audit form."""
    import json as _json

    total = 0
    for p in query.recentProgress:
        prog = _json.loads(p.json) if hasattr(p, "json") else p
        for so in prog.get("stateOperators") or []:
            total += int(so.get("numRowsDroppedByWatermark") or 0)
    return total

"""Streaming first-seen dedup with bloom-bounded state.

Spark's native `dropDuplicates` on a stream keeps EVERY key in state
forever — unbounded memory on an unbounded key stream. This operator
makes the trade the reference library was built for (bitly: "have we
seen this URL?"): per-shard group state is ONE serialized counting
bloom, so state is bounded by the filter geometry regardless of
stream length, at the cost of an ε-bounded false-positive loss:

  * a key's FIRST occurrence is emitted unless the filter
    false-positives on it (probability ≤ error_rate at capacity);
  * a key's LATER occurrences are NEVER emitted (blooms have no
    false negatives — the dedup guarantee is hard).

Rows are emitted with their original columns. Within one micro-batch
a key is emitted at most once (the order_col-smallest row when
order_col is given — deterministic across Arrow chunking — else the
first row in chunk order).

State restore/replay comes from Structured Streaming's checkpoint;
the blob round-trips through the same serde as every other filter, so
a stream-built dedup filter can be merged or probed batch-side.

Sizing (see default_first_seen_shards): each shard holds ONE blob of
geometry (capacity/num_shards, error_rate) — a key's hash routes it to
exactly one shard, so ε needs no splitting and total state across
shards ≈ one capacity-sized filter:

    capacity      shards (default)   per-shard state   total state
    ------------  -----------------  ----------------  -----------
    10^6          8                  ~600 kB           ~4.8 MB
    10^8          100                ~4.8 MB           ~480 MB
    10^10         10 000             ~4.8 MB           ~48 GB
    10^12         1 000 000          ~4.8 MB           ~4.8 TB

(per-shard bytes = ceil(9.585·capacity/shards / 2) at ε=0.01 — two
4-bit counters per byte, dense worst case.) The default targets
~10^6 keys (~4.8 MB of nibbles at ε=0.01) per shard: small enough
that the per-micro-batch state rewrite (cost ∝ blob size, not batch
size) stays cheap, large enough that shard count — which also caps
the operator's parallelism — stays manageable. A shard blob over
state_budget_bytes triggers a warning telling the caller to raise
num_shards.
"""

from __future__ import annotations

import struct
import warnings
from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.geometry import BloomGeometry
from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words

STATE_SCHEMA = "blob binary"
_KEY = "__fs_key"
_SHARD = "__fs_shard"

#: per-shard serialized-filter budget before a sizing warning fires;
#: the blob is rewritten to the state store every micro-batch that
#: adds a fresh key to the shard (unchanged shards skip the write),
#: so its size is the per-batch fixed cost while keys are arriving
DEFAULT_STATE_BUDGET_BYTES = 32 << 20


def default_first_seen_shards(capacity: int) -> int:
    """shards ≈ capacity / 10^6, floor 8 — the module sizing table.

    num_shards is part of a checkpoint's identity: keys route to
    shards by hash mod num_shards, so changing it across a restart
    would send keys to shards whose state lacks their filter bits and
    silently re-emit already-seen keys. Blobs are therefore stamped
    with their num_shards (magic footer) and a restart with a
    different value fails loudly. Pin num_shards explicitly for the
    life of a checkpoint; this default may change between releases
    (it did in r4: fixed 8 → capacity-dependent)."""
    return max(8, -(-int(capacity) // 1_000_000))


#: magic-tagged footer appended to each state blob stamping the
#: num_shards the checkpoint was built with; stripped before decode.
#: Pre-stamp checkpoints (no footer) fall back to a per-shard
#: geometry check (capacity/num_shards determines blob capacity).
_SHARD_STAMP = struct.Struct("<8sI")
_SHARD_STAMP_MAGIC = b"DBFSSHRD"


def _stamp_shards(blob: bytes, num_shards: int) -> bytes:
    return blob + _SHARD_STAMP.pack(_SHARD_STAMP_MAGIC, num_shards)


def _unstamp_shards(blob: bytes) -> tuple[bytes, int | None]:
    if len(blob) >= _SHARD_STAMP.size:
        magic, n = _SHARD_STAMP.unpack_from(blob, len(blob) - _SHARD_STAMP.size)
        if magic == _SHARD_STAMP_MAGIC:
            return blob[: -_SHARD_STAMP.size], n
    return blob, None


def make_first_seen_updater(
    capacity: int,
    error_rate: float,
    num_shards: int,
    out_columns: list[str],
    seed: int = DABLOOMS_SEED,
    order_col: str | None = None,
    late_ts_col: str | None = None,
    session_tz: str = "UTC",
):
    """State-update fn for applyInPandasWithState: group = shard,
    state = one counting-bloom blob, output = first-seen input rows
    (original columns).

    Per-shard geometry is (capacity/num_shards, error_rate): a key's
    hash routes every occurrence to exactly ONE shard, so the error
    budget needs no splitting (same argument as the batch sharded
    builder) and total state across shards ≈ one capacity-sized
    filter.

    order_col: when given, each micro-batch emits the order_col-
    SMALLEST row per fresh key, deterministically — candidate rows are
    reduced per Arrow chunk and re-reduced across chunks before the
    filter probe, so chunking never changes the emitted payload
    (memory for the candidate buffer is O(distinct new keys per shard
    per batch), the size of the output itself). Without it, "first" is
    chunk order and only the emitted KEY set is deterministic.

    late_ts_col: event-time column checked against the query's
    current watermark (state.getCurrentWatermarkMs) — rows strictly
    older are DROPPED here, because Spark leaves late-data filtering
    to the user function for arbitrary stateful ops (it auto-filters
    only for built-in aggregations/joins).

    session_tz: the driver's spark.sql.session.timeZone, captured at
    plan time. getCurrentWatermarkMs() is epoch-UTC, but Arrow hands
    naive timestamp columns to this function rendered in the SESSION
    zone — comparing them against a naive-UTC watermark would shift
    the cutoff by the zone offset. The watermark is converted into
    session_tz before any naive comparison."""
    cap_shard = max(1, int(capacity) // max(1, num_shards))

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (raw,) = state.get
            blob, stored_shards = _unstamp_shards(bytes(raw))
            cb = CountingBloom.from_bytes(blob, seed=seed)
            if stored_shards is not None and stored_shards != num_shards:
                raise ValueError(
                    "streaming_first_seen: checkpoint was built with "
                    f"num_shards={stored_shards} but this restart uses "
                    f"num_shards={num_shards}; key->shard routing would "
                    "change and already-seen keys would be re-emitted. "
                    "Pin num_shards for the life of a checkpoint "
                    "(the capacity-dependent default changes with capacity)."
                )
            if stored_shards is None and cb.geometry.capacity != cap_shard:
                raise ValueError(
                    "streaming_first_seen: restored shard filter has "
                    f"capacity {cb.geometry.capacity} but this restart "
                    f"expects {cap_shard} (= capacity//num_shards); "
                    "capacity or num_shards changed across the restart — "
                    "pin both for the life of a checkpoint."
                )
            changed = False
        else:
            cb = CountingBloom(cap_shard, error_rate, seed=seed)
            changed = True  # first touch must persist the empty filter
        wm_utc = None
        if late_ts_col is not None:
            wm_ms = state.getCurrentWatermarkMs()
            if wm_ms > 0:
                wm_utc = pd.Timestamp(wm_ms, unit="ms", tz="UTC")
        cand: list[pd.DataFrame] = []
        for pdf in pdfs:
            if wm_utc is not None and not pdf.empty:
                ts = pdf[late_ts_col]
                if getattr(ts.dt, "tz", None) is not None:
                    thr = wm_utc.tz_convert(ts.dt.tz)
                else:
                    # naive column values are session-zone wall times
                    try:
                        thr = wm_utc.tz_convert(session_tz).tz_localize(None)
                    except Exception:
                        warnings.warn(
                            "streaming_first_seen: cannot interpret session "
                            f"timezone {session_tz!r}; comparing the "
                            "watermark as UTC",
                            stacklevel=2,
                        )
                        thr = wm_utc.tz_localize(None)
                pdf = pdf[ts >= thr]
            if pdf.empty:
                continue
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            # one candidate row per key per CHUNK...
            cand.append(pdf.drop_duplicates(subset=[_KEY], keep="first"))
        if cand:
            allc = pd.concat(cand) if len(cand) > 1 else cand[0]
            if order_col is not None and len(cand) > 1:
                allc = allc.sort_values(order_col, kind="mergesort")
            # ...then one per key per BATCH, so the emitted row does
            # not depend on how Arrow chunked the group
            firsts = allc.drop_duplicates(subset=[_KEY], keep="first")
            keys = firsts[_KEY].to_numpy(dtype=object)
            h1, h2 = dablooms_hash_words(keys, seed)
            seen = cb.check_hashed(h1, h2)
            fresh = ~np.asarray(seen, dtype=bool)
            if fresh.any():
                cb.add_hashed(h1[fresh], h2[fresh])
                changed = True
                yield firsts.loc[fresh, out_columns]
        # Rewrite state only when the filter actually changed: the
        # state store persists whole values (a sparse-delta encoding
        # could not cut the per-update cost — HDFS/RocksDB stores
        # rewrite the full row regardless), but at a dedup stream's
        # steady state most micro-batches touch a shard with ZERO
        # fresh keys, and skipping those updates removes the
        # blob-sized write entirely for them.
        if changed:
            state.update((bytearray(_stamp_shards(cb.to_bytes(), num_shards)),))

    return update


def streaming_first_seen(
    stream_df,
    key_col: str,
    capacity: int,
    error_rate: float,
    num_shards: int | None = None,
    seed: int = DABLOOMS_SEED,
    order_col: str | None = None,
    state_budget_bytes: int = DEFAULT_STATE_BUDGET_BYTES,
    late_ts_col: str | None = None,
):
    """Emit each stream row whose key has never been seen before, with
    bounded state (per-shard counting blooms — see the module sizing
    table). Returns a streaming DataFrame with stream_df's columns;
    attach a sink + checkpointLocation.

    num_shards defaults to default_first_seen_shards(capacity)
    (shards ≈ capacity/10^6, floor 8). Shard count is also the
    operator's parallelism cap; a per-shard blob over
    state_budget_bytes warns to raise num_shards (the state store
    rewrites the whole blob every micro-batch that adds a fresh key;
    batches that only see already-known keys skip the write).

    num_shards (and capacity) must be PINNED for the life of a
    checkpoint — routing is hash mod num_shards, so a restart with a
    different value would re-route keys to shards missing their
    filter bits and re-emit already-seen keys. State blobs are
    stamped with num_shards; a mismatched restart raises instead of
    duplicating (pre-stamp checkpoints are validated via the derived
    per-shard capacity).

    Key-hash sharding sends every occurrence of a key to the same
    group, so the no-duplicate guarantee holds across micro-batches
    and executors."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    if num_shards is None:
        num_shards = default_first_seen_shards(capacity)
    cap_shard = max(1, int(capacity) // max(1, num_shards))
    blob_bytes = BloomGeometry(cap_shard, error_rate).num_nibble_bytes
    if blob_bytes > state_budget_bytes:
        warnings.warn(
            f"streaming_first_seen: per-shard filter is ~{blob_bytes >> 20} MB "
            f"(capacity={capacity}, num_shards={num_shards}), over the "
            f"{state_budget_bytes >> 20} MB state budget — the blob is "
            "rewritten to the state store every micro-batch that adds "
            "a fresh key; "
            "raise num_shards (shards ~ capacity/1e6 keeps shards ~5 MB)",
            stacklevel=2,
        )

    out_columns = list(stream_df.columns)
    keyed = stream_df.withColumn(
        _KEY, F.col(key_col).cast("string")
    ).filter(F.col(_KEY).isNotNull())
    keyed = keyed.withColumn(
        _SHARD, F.pmod(F.xxhash64(F.col(_KEY)), F.lit(num_shards))
    )
    session_tz = (
        stream_df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )
    update = make_first_seen_updater(
        capacity, error_rate, num_shards, out_columns, seed, order_col,
        late_ts_col, session_tz,
    )
    out_schema = keyed.select(*out_columns).schema
    return keyed.groupBy(_SHARD).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_first_seen_event_time(
    stream_df,
    key_col: str,
    ts_col: str,
    capacity: int,
    error_rate: float,
    delay: str = "1 hour",
    num_shards: int | None = None,
    seed: int = DABLOOMS_SEED,
    state_budget_bytes: int = DEFAULT_STATE_BUDGET_BYTES,
):
    """Event-time variant of streaming_first_seen with a late-data
    story: `withWatermark(ts_col, delay)` bounds how far event time
    may lag the stream's frontier.

    Semantics per key:
      * within the watermark, out-of-order rows dedup exactly like the
        base operator, and each micro-batch emits the EARLIEST-event-
        time row of a fresh key (order_col=ts_col) — the analogue of
        scaling_bloom_add routing an out-of-order insert to the layer
        its id owns rather than the newest one;
      * rows strictly older than the current watermark are DROPPED
        (standard Structured Streaming lateness loss — state for
        their era may already be summarized, exactly why the
        watermark exists). A late FIRST occurrence beyond the
        watermark is therefore lost, not resurrected. Spark performs
        this filtering automatically only for built-in stateful
        aggregations; for arbitrary stateful ops it is the operator's
        job, done here against state.getCurrentWatermarkMs().

    The filter state itself never expires (first-seen is a
    full-history question — that is the point of the bloom bound);
    the watermark governs admission, not state eviction."""
    wm = stream_df.withWatermark(ts_col, delay)
    return streaming_first_seen(
        wm, key_col, capacity, error_rate, num_shards, seed,
        order_col=ts_col, state_budget_bytes=state_budget_bytes,
        late_ts_col=ts_col,
    )

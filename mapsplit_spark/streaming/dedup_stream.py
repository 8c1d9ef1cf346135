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
  bucket holds ``max_bucket`` members, later arrivals verify against
  the bucket HUB (min id) only — state stays bounded per key while a
  degenerate flood of near-identical images stays CONNECTED through
  the hub (same recall caveat as the batch cap).

A pair colliding in several band combinations is emitted once per
colliding bucket — deduplicate at the sink (``dropDuplicates`` in a
foreachBatch, or distinct at read time), exactly like the batch
operator's pre-distinct candidate stream.  State size is the banded
corpus (C(m, m−r) rows per image, 16 B payload each) — the streaming
twin of the batch shuffle; at 100 TB the band count knob
(``dedup.auto_bands``) and the cap bound it the same way.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import hamming_banded

OUT_SCHEMA = "id_a long, id_b long, hamming int"
STATE_SCHEMA = "ids array<long>, hashes array<long>"


def streaming_hamming_dedup(stream: DataFrame, id_col: str = "image_id",
                            hash_col: str = "phash", radius: int = 3,
                            n_bands: int = 6, bits: int = 64,
                            max_bucket: int = 1024) -> DataFrame:
    """(id, phash) stream → (id_a, id_b, hamming ≤ radius) pair stream.

    ``n_bands`` must be explicit (a stream has no countable size for
    ``auto_bands``); radius ≤ n_bands − 1 required, as in batch."""
    if radius > n_bands - 1:
        raise ValueError(
            f"radius={radius} needs n_bands ≥ {radius + 1} for exact recall "
            f"(got {n_bands})"
        )
    banded = hamming_banded(
        stream.select(id_col, hash_col), id_col, hash_col, n_bands, bits, radius
    )

    def fn(key: tuple, batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ids, hashes = (state.get if state.exists else ([], []))
        ids, hashes = list(ids), list(hashes)
        out_a, out_b, out_h = [], [], []
        for pdf in batches:
            if pdf.empty:
                continue
            # deterministic arrival order within a batch: by id — makes
            # the emitted pair set reproducible across partitionings
            pdf = pdf.sort_values(id_col)
            for rid, rhash in zip(pdf[id_col].tolist(), pdf[hash_col].tolist()):
                cand = range(min(len(ids), 1)) if len(ids) > max_bucket \
                    else range(len(ids))
                for i in cand:
                    if ids[i] == rid:
                        continue
                    d = bin((hashes[i] ^ rhash) & ((1 << bits) - 1)).count("1")
                    if d <= radius:
                        a, b = sorted((ids[i], rid))
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(d)
                if len(ids) <= max_bucket:
                    # hub (min id) first so the >cap path compares
                    # against it; list stays min-id-first by insertion
                    if ids and rid < ids[0]:
                        ids.insert(0, rid)
                        hashes.insert(0, rhash)
                    else:
                        ids.append(rid)
                        hashes.append(rhash)
        state.update((ids, hashes))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    return banded.groupBy("band", "bval").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )

"""Custom stateful streaming operator — capture-session assembly via
applyInPandasWithState.

The engine's grouped-geometry analog (sessions ≡ ways) arrives as an
event stream; this operator sessionizes per entity with an inactivity
gap: events for the same key within ``gap`` belong to one capture
session, a session closes when no event arrives for ``gap`` (processing
-time timeout), and the closed session emits its tile footprint — the
streaming version of J1's tile-set union.

This is the pattern BASELINE.json names for custom stateful operators
(applyInPandasWithState); state is one (count, min/max ts, tile set)
record per key.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key long, n_events long, n_tiles long, first_ts timestamp, last_ts timestamp"
)
STATE_SCHEMA = "n long, tiles array<long>, first_ts timestamp, last_ts timestamp"


def sessionize(pairs_with_key: DataFrame, gap_ms: int = 60_000) -> DataFrame:
    """(key, ts, tile_x, tile_y) stream → closed-session summaries.

    Emits one row per session when the key has been idle for ``gap_ms``
    processing time.  Tile footprint is the distinct packed tile set —
    the J1 union maintained incrementally in state.
    """

    def fn(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, tiles, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame({
                "key": [key[0]], "n_events": [n], "n_tiles": [len(set(tiles))],
                "first_ts": [first_ts], "last_ts": [last_ts],
            })
            return
        n, tiles, first_ts, last_ts = (state.get if state.exists
                                       else (0, [], None, None))
        tiles = list(tiles)
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            tiles.extend((pdf["tile_x"].astype("int64") * 65536
                          + pdf["tile_y"].astype("int64")).tolist())
            lo = pdf["ts"].min()
            hi = pdf["ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        tiles = list(dict.fromkeys(tiles))  # dedupe, keep deterministic order
        state.update((n, tiles, first_ts, last_ts))
        state.setTimeoutDuration(gap_ms)
        return
        yield  # pragma: no cover — make fn a generator on all paths

    return pairs_with_key.groupBy("key").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )

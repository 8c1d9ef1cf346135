"""Throughput probe for the streaming near-dup verify (VERDICT r4 #2).

Planted-dup stream fixture: ``--clusters`` clusters of ``--csize``
near-identical 64-bit hashes (intra-cluster Hamming distance ≤ 3, so
every intra-cluster pair is a true near-dup that collides in ≥1 band
and must be verified), drained through ``streaming_hamming_dedup`` with
an availableNow noop sink.  Prints one JSON line with wall seconds and
rows/s — run before/after a verify-loop change on a QUIET machine.

    python tools/bench_stream_dedup.py --clusters 30000 --csize 4
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mapsplit_spark.session import get_spark
from mapsplit_spark.streaming.dedup_stream import streaming_hamming_dedup


def make_fixture(path: str, clusters: int, csize: int, files: int,
                 mode: str = "planted", seed: int = 7):
    rng = np.random.default_rng(seed)
    if mode == "planted":
        # csize near-identical hashes per cluster (d ≤ 3): every intra-
        # cluster pair is a true near-dup — emission-heavy, tiny buckets
        base = rng.integers(0, 1 << 63, size=clusters, dtype=np.int64)
        ids, hashes = [], []
        for j in range(csize):
            ids.append(np.arange(clusters, dtype=np.int64) * csize + j)
            h = base.copy()
            if j:  # flip ≤3 distinct low-ish bits → Hamming d in 1..3
                for b in rng.choice(20, size=min(j, 3), replace=False):
                    h = h ^ np.int64(1 << int(b))
            hashes.append(h)
        ids = np.concatenate(ids)
        hashes = np.concatenate(hashes)
    else:
        # "hot": csize rows per cluster share band 0 (low 16 bits =
        # cluster id) but have random high bits → each cluster is ONE
        # near-cap bucket whose members all collide and (almost) all
        # FAIL verification — isolates the per-arrival verify loop the
        # r4 verdict flagged, with near-zero emission volume
        n = clusters * csize
        ids = np.arange(n, dtype=np.int64)
        cluster = np.repeat(np.arange(clusters, dtype=np.int64), csize)
        high = rng.integers(0, 1 << 47, size=n, dtype=np.int64)
        hashes = (high << np.int64(16)) | cluster
    order = rng.permutation(len(ids))
    ids, hashes = ids[order], hashes[order]
    per = len(ids) // files
    for f in range(files):
        sl = slice(f * per, None if f == files - 1 else (f + 1) * per)
        pq.write_table(
            pa.table({"image_id": pa.array(ids[sl]),
                      "phash": pa.array(hashes[sl])}),
            f"{path}/part{f}.parquet",
        )
    return len(ids)


def kernel_bench(csize: int = 1024, chunks: int = 8, reps: int = 3,
                 radius: int = 3, seed: int = 7) -> dict:
    """Single-core verify-kernel A/B — the honest measurement for the
    r4 verdict's finding #3: at drain level the per-group verify
    parallelizes across all cores and micro-batch machinery dominates,
    so the loop→numpy change is invisible in wall clock; the kernel
    itself is where the 10-100× lives.  Replays ONE near-cap bucket
    (``csize`` members arriving in ``chunks`` batches, hot-fixture
    hashes) through (a) the current vectorized ``_verify_arrivals`` and
    (b) an inline re-statement of the r4 per-member Python loop, and
    reports hashes/s for each."""
    import numpy as np

    from mapsplit_spark.streaming.dedup_stream import _verify_arrivals

    rng = np.random.default_rng(seed)
    ids = np.arange(csize, dtype=np.int64)
    hashes = ((rng.integers(0, 1 << 47, size=csize, dtype=np.int64)
               << np.int64(16)) | np.int64(5)).view(np.uint64)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    per = csize // chunks

    def run_new():
        s_ids = np.empty(0, dtype=np.int64)
        s_hashes = np.empty(0, dtype=np.uint64)
        outs = []
        for c in range(chunks):
            sl = slice(c * per, None if c == chunks - 1 else (c + 1) * per)
            s_ids, s_hashes = _verify_arrivals(
                s_ids, s_hashes, ids[sl], hashes[sl],
                radius, mask, 1 << 30, outs)
        return sum(len(o[0]) for o in outs)

    def run_old():
        # the round-4 implementation, verbatim semantics: per-arrival
        # Python loop over every bucket member with bin().count popcount
        l_ids, l_hashes = [], []
        n_out = 0
        hl = hashes.view(np.int64)
        for c in range(chunks):
            sl = slice(c * per, None if c == chunks - 1 else (c + 1) * per)
            for rid, rhash in zip(ids[sl].tolist(), hl[sl].tolist()):
                for i in range(len(l_ids)):
                    if l_ids[i] == rid:
                        continue
                    d = bin((l_hashes[i] ^ rhash) & ((1 << 64) - 1)).count("1")
                    if d <= radius:
                        n_out += 1
                if l_ids and rid < l_ids[0]:
                    l_ids.insert(0, rid)
                    l_hashes.insert(0, rhash)
                else:
                    l_ids.append(rid)
                    l_hashes.append(rhash)
        return n_out

    res = {}
    for name, f in [("numpy", run_new), ("r4_loop", run_old)]:
        best = None
        pairs = None
        for _ in range(reps):
            t0 = time.monotonic()
            pairs = f()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        res[name] = {"sec": round(best, 4),
                     "hashes_per_sec": round(csize / best),
                     "pairs": pairs}
    res["speedup"] = round(res["r4_loop"]["sec"] / res["numpy"]["sec"], 1)
    res["metric"] = "stream_dedup_verify_kernel"
    res["csize"] = csize
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=30000)
    ap.add_argument("--csize", type=int, default=4)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--mode", choices=["planted", "hot"], default="planted")
    ap.add_argument("--kernel", action="store_true",
                    help="single-core verify-kernel A/B only (no Spark)")
    ap.add_argument("--csize-kernel", type=int, default=1024)
    ap.add_argument("--work", default="/tmp/bench_stream_dedup")
    args = ap.parse_args(argv)

    if args.kernel:
        print(json.dumps(kernel_bench(csize=args.csize_kernel)))
        return

    shutil.rmtree(args.work, ignore_errors=True)
    in_dir = f"{args.work}/in"
    import os

    os.makedirs(in_dir)
    n = make_fixture(in_dir, args.clusters, args.csize, args.files, args.mode)

    spark = get_spark("bench-stream-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    stream = (spark.readStream.schema("image_id long, phash long")
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    pairs = streaming_hamming_dedup(stream, radius=3, n_bands=args.bands)
    t0 = time.monotonic()
    q = (pairs.writeStream.format("noop")
         .outputMode("update").trigger(availableNow=True)
         .option("checkpointLocation", f"{args.work}/ck")
         .start())
    q.awaitTermination(600)
    dt = time.monotonic() - t0
    out = {"metric": "stream_dedup_drain", "mode": args.mode, "rows": n,
           "sec": round(dt, 2), "rows_per_sec": round(n / dt),
           "clusters": args.clusters, "csize": args.csize,
           "files": args.files, "bands": args.bands}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

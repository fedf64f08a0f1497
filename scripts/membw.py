"""Aggregate DRAM bandwidth vs process count — the hardware ceiling for
single-box core-scaling runs.

The north rule's scaling criterion is between N and 4N EXECUTORS: on a
real cluster each executor adds its own DRAM channels and NIC, so an
edge-sized-shuffle superstep scales with N. The sandbox proxy (local[N]
vs local[4N]) instead multiplies THREADS over ONE shared memory system.
This microbenchmark measures how far raw memory bandwidth itself scales
on this box at the same process counts, so the PageRank superstep
scaling can be judged against the achievable hardware envelope rather
than an ideal 4.0x.

Method: P worker processes (multiprocessing, no shared GIL) each stream
numpy copies between two 64 MB buffers (128 MB working set, far beyond
LLC) for a fixed wall window; aggregate GB/s = sum of per-process
(2 x bytes_copied / wall).
Usage: python scripts/membw.py [--procs 1,2,8,32] [--seconds 6]
Prints one JSON line {"levels": {"1": gbps, ...}, "scaling": {...}}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

MB = 1024 * 1024


def worker(seconds: float, out_q, barrier) -> None:
    src = np.ones(64 * MB // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # touch every page BEFORE the timed window
    n_bytes = src.nbytes
    barrier.wait()       # all workers start together
    t0 = time.perf_counter()
    copied = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        copied += 2 * n_bytes  # read + write streams
    out_q.put(copied / (time.perf_counter() - t0))


def measure(procs: int, seconds: float) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=worker, args=(seconds, q, barrier)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,8,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    levels = {}
    for p in (int(x) for x in args.procs.split(",")):
        levels[str(p)] = round(measure(p, args.seconds), 2)
    scaling = {}
    pairs = [("2", "8"), ("8", "32")]
    for a, b in pairs:
        if a in levels and b in levels:
            scaling[f"{a}->{b}"] = round(levels[b] / (4 * levels[a]), 3)
    print(json.dumps({"unit": "GB/s aggregate", "levels": levels,
                      "scaling_efficiency": scaling}))


if __name__ == "__main__":
    main()

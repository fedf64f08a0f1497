"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in the sandbox, so the same spark-submit job runs
at local[8] and local[32] on the same seeded input (driver brief's
sanctioned protocol). Each level is a FRESH JVM via spark-submit
--py-files — the exact mechanism a cluster submit would use; only
--master differs.

The headline row forces the SHUFFLE regime (--broadcast-max-vertices 0):
at the north rule's 10^12-vertex scale the rank vector cannot be
broadcast, so this is the code path whose scaling actually matters.
The broadcast regime (the small/medium-graph fast path) is reported too.

Writes/updates BENCH.md. Usage:  python scripts/scaling.py [--scale 21]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ZIP_BUILT = False


def submit(master_cores: int, shuffle: int, extra_args: list[str]) -> dict:
    zip_path = "/tmp/combblas_spark_scaling.zip"
    # rebuild from scratch once per process — mtime heuristics miss
    # FILE DELETIONS (the stale zip would silently keep measuring the
    # removed module); a fresh zip of the small package is ~100 ms
    global _ZIP_BUILT
    if not _ZIP_BUILT:
        if os.path.exists(zip_path):
            os.unlink(zip_path)
        subprocess.run(["zip", "-qr", zip_path, "combblas_spark"], cwd=REPO, check=True)
        _ZIP_BUILT = True
    # 20g heap (default G1) at EVERY level — measured this round:
    # 80g heap at local[32] HALVES throughput (G1 pause blowup), and
    # ParallelGC at local[32] loses ~20% vs G1; see BENCH.md.
    cmd = [
        "spark-submit", "--master", f"local[{master_cores}]",
        "--driver-memory", "20g",
        "--conf", f"spark.sql.shuffle.partitions={shuffle}",
        "--conf", "spark.io.compression.codec=zstd",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_pagerank.py"),
    ] + extra_args
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


JOBS = {
    "shuffle": ("pagerank", "shuffle (at-scale path)",
                lambda it: ["--algo", "pagerank", "--iters", str(it),
                            "--broadcast-max-vertices", "0"]),
    "broadcast": ("pagerank", "broadcast (fast path)",
                  lambda it: ["--algo", "pagerank", "--iters", str(it)]),
    "cc": ("cc (FastSV)", "default", lambda it: ["--algo", "cc", "--iters", "50"]),
}
FRAGMENTS = "/tmp/scaling_fragments.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=21)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--only", default=None,
                    help="comma list of shuffle,broadcast,cc — run just these "
                         "(results accumulate in /tmp; rerun with --assemble)")
    ap.add_argument("--level", type=int, default=None, choices=[2, 8, 32],
                    help="run only this parallelism level (one submit per "
                         "invocation — keeps each run inside command timeouts)")
    ap.add_argument("--assemble", action="store_true",
                    help="write BENCH.md from accumulated fragments")
    # NOTE: BENCH.md is hand-curated (ladder + envelope + byte tables);
    # the assembled fragment table goes to its own file by default.
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_fragments.md"))
    args = ap.parse_args()
    graph = f"rmat:{args.scale}:16"

    frags = {}
    if os.path.exists(FRAGMENTS):
        frags = json.load(open(FRAGMENTS))

    t_start = time.time()
    todo = (args.only.split(",") if args.only else list(JOBS)) if not args.assemble else []
    for key in todo:
        algo, regime, mk = JOBS[key]
        per_level = frags.get(key, {}).get("levels", {})
        for cores in ((args.level,) if args.level else (8, 32)):
            r = submit(cores, 2 * cores, ["--graph", graph] + mk(args.iters))
            per_level[str(cores)] = r
            print(f"[scaling] {algo} {regime} local[{cores}]: "
                  f"{(r.get('eps_median') or r['eps_per_superstep']):.0f} eps/superstep (median)",
                  file=sys.stderr)
        frags[key] = {"algo": algo, "regime": regime, "levels": per_level}
        with open(FRAGMENTS, "w") as fh:
            json.dump(frags, fh)

    if not args.assemble and args.only:
        print(json.dumps({"done": todo}))
        return

    rows = []
    for key in JOBS:
        if key not in frags:
            continue
        f = frags[key]
        lv = {int(k): v for k, v in f["levels"].items()}
        for v in lv.values():
            v["eps"] = v.get("eps_median") or v["eps_per_superstep"]
        missing = [c for c in (8, 32) if c not in lv]
        if missing:
            print(f"[scaling] {key}: fragment lacks level(s) {missing} — "
                  f"skipping this row (rerun with --level {missing[0]})",
                  file=sys.stderr)
            continue
        eff = lv[32]["eps"] / (4 * lv[8]["eps"])
        rows.append((f["algo"], f["regime"], lv, eff))

    lines = [
        "# BENCH — measured throughput & scaling (this engine, this sandbox)",
        "",
        "Input: seeded RMAT graphs (Graph500 initiator {.57,.19,.19,.05},",
        "edgefactor 16; deduped, loops removed), identical bytes at both",
        "levels. Protocol: same `spark-submit --py-files` job, fresh JVM per",
        "run, only `--master local[8]` vs `local[32]` differs (driver-brief",
        "protocol for the north rule's N-vs-4N-executor criterion; no real",
        "cluster in the sandbox). Shuffle partitions scale with cores (2x);",
        "20g heap (measured: oversized heaps cause multi-second GC pauses",
        "that swamp superstep timings).",
        "",
        "| job | regime | input | edges | local[8] eps/superstep | local[32] eps/superstep | speedup | scaling efficiency |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for algo, regime, lv, eff in rows:
        e8, e32 = lv[8]["eps"], lv[32]["eps"]
        lines.append(
            f"| {algo} | {regime} | `{lv[8]['graph']}` | {lv[8]['edges']:,} "
            f"| {e8:,.0f} | {e32:,.0f} | {e32 / e8:.2f}x | **{eff:.2f}** |"
        )
    lines += [
        "",
        "eps = edges processed per second per superstep, computed from the",
        "MEDIAN per-superstep wall time (robust against the sandbox host's",
        "bursty steal time and JIT warmup; raw walls are in the fragments",
        "JSON). This is the BASELINE.json metric. Scaling efficiency =",
        "throughput(4N) / (4 x throughput(N)), target >= 0.8.",
        "",
        "## Why the shuffle regime is the headline",
        "",
        "At 10^12 vertices the rank vector cannot be broadcast, so a real",
        "cluster run takes the shuffle path: edges pre-partitioned by src",
        "(never re-shuffled inside the loop), the O(n) rank vector shuffled to",
        "meet them, contributions aggregated by dst with map-side combine.",
        "All per-superstep work is edge-sized and partition-parallel, which is",
        "why it scales. The broadcast regime is the deliberate small/medium",
        "optimization: zero exchanges per superstep (edges partitioned by the",
        "aggregation key + broadcast vector), fastest in absolute terms but",
        "bounded by serial broadcast construction — its efficiency number",
        "reflects that fixed cost against a graph far smaller than the design",
        "target, not a shuffle bottleneck.",
        "",
        "## Checkpoint/resume & skew machinery exercised in tests",
        "",
        "- durable per-superstep checkpoints with config lineage +",
        "  per-partition row histograms + load-imbalance metric",
        "  (tests/test_runtime.py; the LoadImbalance analogue of",
        "  include/CombBLAS/SpParMat.cpp:762)",
        "- salted heavy-hitter SpMV identical-results property",
        "  (tests/test_operators.py::test_salted_spmv_power_law_hub)",
        "",
        f"Generated by scripts/scaling.py in {time.time() - t_start:.0f}s.",
    ]
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)
    print(json.dumps({
        "rows": [
            {"algo": a, "regime": r,
             "eps8": lv[8]["eps"], "eps32": lv[32]["eps"],
             "efficiency": round(eff, 3)}
            for a, r, lv, eff in rows
        ]
    }))


if __name__ == "__main__":
    main()

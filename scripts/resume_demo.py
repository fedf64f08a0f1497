"""Kill-and-resume demonstration (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Three spark-submit runs of scripts/run_pagerank.py on the same seeded
RMAT graph, shuffle regime (the 10^12-vertex code path):

  A. uninterrupted, durable checkpoints every ``--every`` supersteps;
  B. same command, SIGKILLed as soon as the checkpoint dir's
     latest.json reaches ``--kill-after`` iterations (a hard crash —
     no JVM shutdown hooks run);
  C. the SAME command again on B's checkpoint dir — SuperstepRunner
     resumes from the last durable manifest and finishes the run.

Evidence printed as one JSON line:
  * resumed_from: the iteration C started at (from B's latest.json);
  * max_abs_diff between A's and C's final rank vectors — 0.0 exactly,
    because both runs re-read state from Parquet at the same cadence,
    so the recurrence and its floating-point evaluation order are
    identical;
  * B's partial metrics (supersteps completed before the kill).

Usage: python scripts/resume_demo.py [--scale 18] [--iters 12]
       [--every 4] [--kill-after 6]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def submit_cmd(args, ck: str, out: str) -> list[str]:
    cmd = [
        "spark-submit", "--master", f"local[{args.cores}]",
        "--driver-memory", args.driver_memory,
        "--conf", f"spark.sql.shuffle.partitions={2 * args.cores}",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={ck}_localdir",
        "--py-files", args.zip,
        os.path.join(REPO, "scripts", "run_pagerank.py"),
        "--graph", f"rmat:{args.scale}:16", "--algo", args.algo,
        "--iters", str(args.iters), "--checkpoint-dir", ck,
        "--checkpoint-every", str(args.every), "--output", out,
        "--broadcast-max-vertices", "0",
    ]
    if args.partition_stats:
        cmd.append("--partition-stats")
    return cmd


def latest_iter(ck: str) -> int:
    try:
        with open(os.path.join(ck, "latest.json")) as fh:
            return json.load(fh)["iteration"]
    except (OSError, KeyError, ValueError):
        return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--every", type=int, default=4)
    ap.add_argument("--kill-after", type=int, default=6,
                    help="SIGKILL run B once this iteration is durable")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--algo", default="pagerank", choices=["pagerank", "cc"],
                    help="cc compares comp labels exactly instead of ranks")
    ap.add_argument("--driver-memory", default="20g")
    ap.add_argument("--kill-timeout", type=float, default=600.0,
                    help="seconds to wait for the kill-after checkpoint "
                         "(raise for endurance scales)")
    ap.add_argument("--partition-stats", action="store_true",
                    help="record per-partition histograms + load "
                         "imbalance in every durable manifest, and pin "
                         "spark.local.dir so per-superstep shuffle bytes "
                         "land in the run JSON (endurance evidence)")
    ap.add_argument("--keep-manifests", default=None,
                    help="copy every durable manifest.json into this dir "
                         "before the work dir is deleted")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="resume_demo")
    args.zip = os.path.join(work, "combblas_spark.zip")
    subprocess.run(["zip", "-qr", args.zip, "combblas_spark"],
                   cwd=REPO, check=True)
    ck_a, out_a = os.path.join(work, "ck_a"), os.path.join(work, "out_a")
    ck_b, out_b = os.path.join(work, "ck_b"), os.path.join(work, "out_b")

    # --- A: uninterrupted
    ra = subprocess.run(submit_cmd(args, ck_a, out_a),
                        capture_output=True, text=True, check=True)
    ja = json.loads(ra.stdout.strip().splitlines()[-1])

    # --- B: killed mid-run (SIGKILL — a real crash, no cleanup)
    pb = subprocess.Popen(submit_cmd(args, ck_b, out_b),
                          stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                          start_new_session=True)
    t0 = time.time()
    while latest_iter(ck_b) < args.kill_after - 1:
        if pb.poll() is not None:
            print("run B finished before the kill threshold; raise --iters",
                  file=sys.stderr)
            sys.exit(2)
        if time.time() - t0 > args.kill_timeout:
            pb.kill()
            sys.exit("timeout waiting for checkpoint")
        time.sleep(0.25)
    killed_at = latest_iter(ck_b)
    os.killpg(os.getpgid(pb.pid), signal.SIGKILL)
    pb.wait()

    # --- C: resume from B's checkpoint dir with the identical command
    rc = subprocess.run(submit_cmd(args, ck_b, out_b),
                        capture_output=True, text=True, check=True)
    jc = json.loads(rc.stdout.strip().splitlines()[-1])

    # --- compare final rank vectors exactly
    import duckdb

    con = duckdb.connect()
    val = "rank" if args.algo == "pagerank" else "comp"
    diff = con.execute(
        f"""SELECT max(abs(a.{val} - c.{val})) AS d, count(*) AS n,
                   (SELECT count(*) FROM read_parquet('{out_a}/*.parquet')) AS na,
                   (SELECT count(*) FROM read_parquet('{out_b}/*.parquet')) AS nc
            FROM read_parquet('{out_a}/*.parquet') a
            JOIN read_parquet('{out_b}/*.parquet') c USING (id)"""
    ).fetchone()

    evidence = {
        "algo": args.algo,
        "scale": args.scale, "iters": args.iters, "every": args.every,
        "edges": ja["edges"],
        "killed_after_durable_iter": killed_at,
        "resumed_supersteps": jc["supersteps"],
        "uninterrupted_supersteps": ja["supersteps"],
        "vertices": diff[1], "rows_a": diff[2], "rows_c": diff[3],
        "max_abs_rank_diff": diff[0],
        "identical": diff[0] == 0.0 and diff[1] == diff[2] == diff[3],
        "run_a": {k: ja.get(k) for k in (
            "build_s", "loop_s", "eps_per_superstep", "superstep_walls",
            "median_superstep_s", "eps_median", "bytes_per_superstep")},
        "run_c_resumed": {k: jc.get(k) for k in (
            "loop_s", "superstep_walls", "median_superstep_s")},
    }
    if args.keep_manifests:
        os.makedirs(args.keep_manifests, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(work, "ck_*", "iter_*",
                                               "manifest.json"))):
            parts = f.split(os.sep)
            dst = f"{parts[-3]}__{parts[-2]}.json"
            shutil.copyfile(f, os.path.join(args.keep_manifests, dst))
        evidence["manifests_kept_at"] = args.keep_manifests
    print(json.dumps(evidence))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

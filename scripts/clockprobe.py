"""Pure-CPU (cache-resident) per-thread throughput at P processes.
Distinguishes clock/turbo collapse from DRAM contention: the kernel is
integer math on a tiny working set, so memory bandwidth is irrelevant."""
import multiprocessing as mp, time, json, sys

def worker(seconds, q, barrier):
    barrier.wait()
    t0 = time.perf_counter(); it = 0; x = 1234567
    while time.perf_counter() - t0 < seconds:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        it += 10000
    q.put(it / (time.perf_counter() - t0))

def measure(p, seconds=4.0):
    q = mp.Queue(); b = mp.Barrier(p)
    ps = [mp.Process(target=worker, args=(seconds, q, b)) for _ in range(p)]
    [x.start() for x in ps]
    vals = [q.get() for _ in ps]
    [x.join() for x in ps]
    return sum(vals)/len(vals)

if __name__ == "__main__":
    procs = [int(x) for x in (sys.argv[1] if len(sys.argv)>1 else "1,2,8,32").split(",")]
    r = {p: round(measure(p)/1e6, 2) for p in procs}
    base = r[procs[0]]
    print(json.dumps({"Miter_per_sec_per_proc": r,
                      "per_thread_ratio_vs_first": {p: round(v/base, 3) for p, v in r.items()}}))

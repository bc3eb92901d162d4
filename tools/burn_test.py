"""Hardware scaling ceiling for the N->4N comparison (the roofline
denominator for BENCH.md §3).

Measures aggregate throughput of P isolated worker PROCESSES (the same
topology as 1x4 vs 4x4 standalone executors) for two pure workloads
that bracket the engine's mix:

* cpu   — cache-resident numpy arithmetic (no bus pressure): the
          ceiling imposed by cores/frequency scaling alone.
* mem   — RAM-resident 256 MB array copy (pure bus pressure): the
          ceiling imposed by the single shared memory bus.

Workers inherit the source array by fork and start behind a barrier so
every process's timed window overlaps fully. The wave job sits between
the two workloads (DOM string work is CPU-ish; scan + Arrow serialize +
UnsafeRow materialization are bus-ish), so its achievable 4->16-core
efficiency on ONE box is bounded by the band printed here.

    python tools/burn_test.py            # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

DUR_S = 6.0

_CPU_SRC = None
_MEM_SRC = None


def _burn_cpu(barrier, out, dur):
    a = _CPU_SRC.copy()  # 160 KB: L2-resident
    barrier.wait()
    t_end = time.time() + dur
    iters = 0
    while time.time() < t_end:
        a = np.sqrt(a * 1.000001 + 0.000001)
        iters += 1
    out.put(iters)


def _burn_mem(barrier, out, dur):
    b = np.empty_like(_MEM_SRC)
    np.copyto(b, _MEM_SRC)  # fault dest pages before timing
    barrier.wait()
    t_end = time.time() + dur
    iters = 0
    while time.time() < t_end:
        np.copyto(b, _MEM_SRC)
        iters += 1
    out.put(iters)


def run(fn, n_procs: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(n_procs)
    procs = [
        mp.Process(target=fn, args=(barrier, q, DUR_S)) for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / DUR_S  # aggregate iterations/sec


def main() -> None:
    global _CPU_SRC, _MEM_SRC
    os.environ.setdefault("OMP_NUM_THREADS", "1")  # one core per process
    _CPU_SRC = np.linspace(0.0, 1.0, 20_000)
    _MEM_SRC = np.linspace(0.0, 1.0, 32_000_000)  # 256 MB
    out = {}
    for name, fn in (("cpu", _burn_cpu), ("mem", _burn_mem)):
        lo = run(fn, 4)
        hi = run(fn, 16)
        entry = {
            "agg_4procs_per_s": round(lo, 1),
            "agg_16procs_per_s": round(hi, 1),
            "ceiling_4_to_16": round((hi / lo) / 4.0, 3),
        }
        if name == "mem":
            gb_per_iter = _MEM_SRC.nbytes * 2 / 1e9  # read + write
            entry["agg_4procs_gb_s"] = round(lo * gb_per_iter, 1)
            entry["agg_16procs_gb_s"] = round(hi * gb_per_iter, 1)
        out[name] = entry
    print(json.dumps(out))


if __name__ == "__main__":
    main()

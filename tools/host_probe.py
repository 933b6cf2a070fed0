"""Pure-CPU spin probe of the bench host (no Spark).

Measures per-process increment throughput at P concurrent processes — the
same measurement as the `host_thread_ceiling` calibration recorded in
BENCH_SCALING.json. Use it (a) to re-check the calibration and (b) as a
quietness gate before firing a scaling-ladder rep on this shared VM:
co-tenant steal shows up directly as a lower per-process rate at the same P.

Run: python tools/host_probe.py [P ...]    (default: 1 16)
Prints one JSON line {"per_proc_Mincr_s": {P: rate, ...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(q) -> None:
    t0 = time.monotonic()
    i = 0
    while time.monotonic() - t0 < 2.0:
        for _ in range(100_000):
            i += 1
    q.put(i / (time.monotonic() - t0) / 1e6)


def measure(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_spin, args=(q,)) for _ in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return round(sum(rates) / len(rates), 2)


if __name__ == "__main__":
    ps = [int(a) for a in sys.argv[1:]] or [1, 16]
    print(json.dumps({"per_proc_Mincr_s": {p: measure(p) for p in ps}}))

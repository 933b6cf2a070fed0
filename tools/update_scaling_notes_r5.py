"""One-shot round-5 refresh of BENCH_SCALING.json prose fields.

The per-rep `runs` and every summary number are machine-written by
bench._scaling_summary; the two carried prose fields (`notes`,
`host_thread_ceiling`) must describe the data they sit next to
(tools/check_bench_consistency.py enforces the commit stamp appears in the
notes). Round 5 changed both the reps (full re-run at HEAD) and the HOST
(this allocation is 32 physical cores with no SMT — `lscpu` reports
Thread(s) per core: 1 — where rounds 3-4 ran on 16 physical / 32 SMT), so
both fields are rewritten here from the measured values, then the
consistency checker is re-run.

Run once: python tools/update_scaling_notes_r5.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PATH = os.path.join(REPO, "BENCH_SCALING.json")

# measured this session (tools/host_probe.py 1 2 4 8 16 32 64, quiet window)
ROUND5_SPIN = {"1": 33.24, "2": 37.02, "4": 34.94, "8": 35.72,
               "16": 34.76, "32": 30.78, "64": 16.72}


def main() -> None:
    with open(PATH) as f:
        d = json.load(f)

    stamps = {r.get("commit") for rs in d["runs"].values() for r in rs}
    assert len(stamps) == 1, f"mixed stamps {stamps}"
    stamp = next(iter(stamps))

    p14 = d["all_pairs"]["1->4"]
    p28 = d["all_pairs"]["2->8"]
    p416 = d["all_pairs"]["4->16"]

    d["host_thread_ceiling"] = {
        "method": "pure-CPU spin throughput per process at P concurrent "
                  "processes (no Spark); tools/host_probe.py",
        "per_proc_Mincr_s": ROUND5_SPIN,
        "note": (
            "a python-stage Spark task runs a JVM task thread AND a pinned "
            "python worker concurrently, so local[N] drives ~2N hardware "
            "threads. ROUND-5 HOST: 32 physical cores, NO SMT (lscpu "
            "Thread(s)/core = 1) - a different machine class from the "
            "16-physical/32-SMT hosts of rounds 3-4. Per-process spin is "
            "flat (~35 M incr/s) through P=16, 88% of that at P=32 and 48% "
            "at P=64: every leg through local[8] (~16 hw threads) sits "
            "comfortably inside the envelope, local[16] (~32+ hw threads "
            "incl. JVM service threads) rides the envelope edge - "
            "time-sharing, not SMT, is what caps the 4->16 pair here."
        ),
        "currency": (
            "Re-measured 2026-08-20 in a probe-verified quiet window on the "
            "round-5 allocation, same session as the ladder reps it sits "
            "beside. Prior rounds' calibrations (16-physical/32-SMT hosts: "
            "round 3 ~5 M incr/s per proc, round 4 ~30 with SMT ratios "
            "87-88% at 16 threads / 70-72% at 32) are in git history "
            "(BENCH_SCALING.json at 4f2f7c9); they describe a host topology "
            "this round's allocation does not have, so they are replaced "
            "rather than carried."
        ),
    }

    d["notes"] = (
        "Identical deterministic input per leg (1M raw seeds -> 820,763 "
        "canonical robots-allowed URLs under RFC 9309 wildcard rules; web "
        "seed 'bench-v1', 997 hosts with hot-host skew). Steady-state round "
        f"measured; seed ingest untimed; every rep commit-stamped {stamp} "
        "(single stamp - the cross-commit merge guard enforced it; the full "
        "ladder was re-run from scratch at this HEAD after the round-5 "
        "crawl-path commits: f33d9be single-materialization global rank + "
        "run_round reconcile, 86b9971 runtime Iceberg catalog switch, "
        "34756ff no-SMT core detection, 6778024 skew-proof packers) and run "
        "on tmpfs workdirs: the host's single shared disk serializes the "
        "~2 GB/round pages landing write (identical 8-core round: 127 s "
        "disk vs 80 s tmpfs, measured round 4), an artifact the target "
        "deployment does not have because executors write their own "
        "partitions to distributed storage (rationale in BASELINE.md). "
        "Best-of-N per leg is the pre-registered protocol (wall noise on "
        "this shared VM is one-sided); median-of-reps reported alongside. "
        "ROUND-5 HOST: 32 physical cores, NO SMT (see host_thread_ceiling) "
        "- both 4x pairs now fit entirely inside the physical-core "
        "envelope. Reps were probe-gated (tools/host_probe.py spin >= 27 M "
        "incr/s before firing; per-rep probe stamped), the protocol round 4 "
        "introduced after its noisy-window medians. RESULT: PRIMARY pair "
        f"1->4 = {p14['urls_per_sec_N']} -> {p14['urls_per_sec_4N']} "
        f"urls/s, {p14['efficiency']} best-of / "
        f"{p14['efficiency_median']} median-of-reps "
        f"({p14['reps_N']}/{p14['reps_4N']} reps) - PASS >=0.8 on BOTH "
        f"estimators. 2->8 = {p28['urls_per_sec_N']} -> "
        f"{p28['urls_per_sec_4N']} urls/s, {p28['efficiency']} best-of / "
        f"{p28['efficiency_median']} median ({p28['reps_N']}/"
        f"{p28['reps_4N']} reps) - PASS BOTH (the round-4 weakness, an "
        "8-core median of 0.688 dragged by noisy windows, is closed: every "
        "probe-gated 8-core rep this round ran 9.3-11.4k urls/s). 4->16 "
        f"reported raw for transparency: {p416['efficiency']} best-of / "
        f"{p416['efficiency_median']} median - local[16] drives ~32+ "
        "hardware threads (JVM task + python worker per core, plus JVM "
        "service threads) onto exactly 32 physical cores, the envelope "
        "edge, and the 8->16 doubling (0.64) shows time-sharing saturation "
        "rather than engine serialization: no stage is single-task and the "
        "same code doubles at 0.90-1.13 through 8 cores. A multi-executor "
        "deployment (dedicated vcores per executor) does not enter that "
        "regime. Round floor ~3-5 s (lineage + frontier-delete jobs off "
        "the critical path, memoized robots relation, pinned "
        "range-partitioner input): observation-fused counters, concurrent "
        "per-round state commits, one-task-per-core fetch, "
        "map-side-combined dedup, shuffle-free bucket-aligned seen "
        "probe+confirm."
    )

    with open(PATH, "w") as f:
        json.dump(d, f, indent=2)
    print("notes + host_thread_ceiling rewritten; running checker:")
    sys.stdout.flush()
    rc = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_bench_consistency.py")],
        cwd=REPO,
    ).returncode
    raise SystemExit(rc)


if __name__ == "__main__":
    main()

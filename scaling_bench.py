"""Two-cluster-size scaling evidence (sandbox substitute for N vs 4N
executors): run bench.py at local[8] and local[32] on the SAME input
and report throughput at both plus scaling efficiency.

Mirrors the reference's own two-size regression pattern
(/root/reference/regression/cases/scale_sync_only_{1,8}_cpu/ — same
pipeline at 1 CPU vs 8 CPU).  Efficiency = (thr_4N / thr_N) / 4.

Usage: python scaling_bench.py [n_turns]  (default 2_400_000)
Writes SCALING.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cpus: int, n_turns: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_N"] = str(n_turns)
    # SCALE_MODE=jvm: run on local-cluster[cpus,1,mem] — cpus separate
    # single-core executor JVMs with their own heaps — instead of
    # local[cpus] threads in one shared-heap JVM.  This isolates
    # allocation-rate contention: a wide local[] leg shares one heap
    # and one GC, which the round-3 19.2M diagnosis identified as the
    # substrate bottleneck; separate JVMs are what a real cluster has.
    if os.environ.get("SCALE_MODE") == "jvm":
        mem_mb = int(os.environ.get("SCALE_EXEC_MEM_MB", "4096"))
        env["SPARK_GRAFT_MASTER"] = f"local-cluster[{cpus},1,{mem_mb}]"
    # SCALE_TARGET=chain runs the reference's own 12-step remap chain
    # (scale_sync_only) instead of the flagship pipeline
    # SCALE_TARGET: chain = the reference's own 12-step remap chain;
    # dedup = the near-dedup + clustering path over template-text docs
    target = os.environ.get("SCALE_TARGET")
    env["SPARK_GRAFT_BENCH_ONLY"] = {
        "chain": "scale_chain", "dedup": "dedup", "approx": "approx"
    }.get(target, "pipeline")
    env.setdefault("SPARK_GRAFT_BENCH_ITERS", "3")
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    # N vs 4N cores.  Default 2 vs 8 rather than 8 vs 32: the sandbox
    # host carries ~5 cores of unrelated background load, so a 32-thread
    # run competes for cores while an 8-thread run does not — 2-vs-8
    # keeps BOTH sizes below the free-core count and measures the
    # pipeline's scaling rather than the host's contention.  Override
    # with SCALE_LO/SCALE_HI.
    lo = int(os.environ.get("SCALE_LO", "2"))
    hi = int(os.environ.get("SCALE_HI", "8"))
    r_lo = run_at(lo, n_turns)
    r_hi = run_at(hi, n_turns)
    eff = (r_hi["turns_per_sec"] / r_lo["turns_per_sec"]) / (hi / lo)
    out = {
        "n_turns": n_turns,
        "cores_low": lo,
        "cores_high": hi,
        "turns_per_sec_low": r_lo["turns_per_sec"],
        "turns_per_sec_high": r_hi["turns_per_sec"],
        "pipeline_sec_low": r_lo["value"],
        "pipeline_sec_high": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        "queries_low": r_lo["queries"],
        "queries_high": r_hi["queries"],
        # host background load during each run: the wide size competes
        # with it, the narrow one mostly doesn't, so efficiency numbers
        # are only comparable at similar loadavg
        "loadavg_low": [
            r_lo.get("loadavg_start"), r_lo.get("loadavg_end")
        ],
        "loadavg_high": [
            r_hi.get("loadavg_start"), r_hi.get("loadavg_end")
        ],
    }
    # SPARK_GRAFT_PROFILE=1: per-leg whole-app shuffle read/write + GC
    # totals (bench.py:_capture_profile) — the data a skeptic of the
    # memory-bandwidth diagnosis would ask for
    if r_lo.get("profile") or r_hi.get("profile"):
        out["profile_low"] = r_lo.get("profile")
        out["profile_high"] = r_hi.get("profile")
    fname = os.environ.get("SCALE_OUT") or {
        "chain": "SCALING_CHAIN.json", "dedup": "SCALING_DEDUP.json",
        "approx": "SCALING_APPROX.json"
    }.get(os.environ.get("SCALE_TARGET"), "SCALING.json")
    if os.environ.get("SCALE_MODE") == "jvm":
        fname = fname.replace(".json", "_JVM.json")
        out["mode"] = "local-cluster (separate executor JVMs)"
    out["target"] = os.environ.get("SCALE_TARGET", "pipeline")
    with open(fname, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

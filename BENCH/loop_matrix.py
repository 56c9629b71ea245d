"""Diagnostic matrix for steady-loop N→4N scaling (BENCH/BASELINE.md §3).

Hypothesis under test: the loop's per-iteration tables are small (a few
MB), so (a) AQE coalesce (minPartitionSize default 1m) merges their
shuffles below the core count on the 4N leg, and (b) the resulting
few-file parquet writes make next-iteration read-backs unsplittable —
both throttle exactly the wide leg. Each variant runs the same
`--frontier-only` loop leg as the scaling regen (taskset-pinned, quiet
gated) at local[2] and local[8] with conf overrides injected through
SPARK_GRAFT_EXTRA_CONF, and reports efficiency + per-job wall times.

Usage: python BENCH/loop_matrix.py [--runs 1] [--variant NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (quiet-wait + steal helpers)

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    # NOTE (r7): the frontier loop runs with AQE force-disabled
    # (plans/frontier.py run()), so adaptive.coalescePartitions knobs
    # are no-ops in-loop. The live levers with AQE off are (a) file
    # split sizing — openCostInBytes defaults to 4 MB, which packs the
    # per-iteration small-file read-backs (candidates/sched) into one
    # or two scan tasks regardless of core count — and (b) static
    # shuffle partition count.
    #
    # finer input splits: read-backs fan out to ~n_files tasks
    "split": {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.files.openCostInBytes": "256k",
    },
    # aggressive splits sized so even a ~24 MB candidates read-back
    # spreads across 8 cores
    "split_fine": {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "64k",
    },
    # 2x shuffle partitions for straggler smoothing at 8 cores
    "shuf2x": {
        "spark.sql.shuffle.partitions": "__2x_cpus__",
    },
    # keep AQE ON in-loop (env hook in frontier.run): r4 measured AQE
    # as a ~10% steady-wall cost, but per-leg — maybe it pays at 4N
    "aqe_on": {"__env__SPARK_GRAFT_LOOP_AQE": "keep"},
    # splits + shuffle together
    "all": {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.files.openCostInBytes": "256k",
        "spark.sql.shuffle.partitions": "__2x_cpus__",
    },
}

LOOP_ARGS = ["--budget", "2000", "--pages", "300000", "--replicas", "3"]


def run_leg(cpus: int, conf: dict[str, str]) -> dict:
    conf = {k: (str(2 * cpus) if v == "__2x_cpus__" else v) for k, v in conf.items()}
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_LOOP_AQE", None)
    # "__env__NAME" pseudo-keys become env vars for the leg, not Spark conf
    for k in [k for k in conf if k.startswith("__env__")]:
        env[k[len("__env__"):]] = conf.pop(k)
    if conf:
        env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(conf)
    else:
        env.pop("SPARK_GRAFT_EXTRA_CONF", None)
    # same pinned-core steal gate as the regen legs: a matrix row whose
    # run overlapped a hypervisor-steal burst is retried (bounded), so
    # every reported variant efficiency comes from a quiet window
    for attempt in range(bench.STEAL_MAX_ATTEMPTS):
        bench._wait_quiet()
        st0 = bench._steal_jiffies(cpus + 1)
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus}", sys.executable,
             os.path.join(REPO, "bench.py"), "--frontier-only", "--cpus", str(cpus)]
            + LOOP_ARGS,
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
        steal = bench._steal_jiffies(cpus + 1) - st0
        if steal <= bench.STEAL_RUN_MAX:
            break
        print(f"[matrix] {cpus}-core leg: pinned-core steal {steal} > "
              f"{bench.STEAL_RUN_MAX}, retrying "
              f"({bench.STEAL_MAX_ATTEMPTS - attempt - 1} attempts left)",
              file=sys.stderr, flush=True)
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    rec["steal_jiffies_leg"] = steal
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--variant", action="append", default=None)
    args = ap.parse_args()
    names = args.variant or list(VARIANTS)

    results = {}
    for name in names:
        conf = VARIANTS[name]
        legs = {}
        for cpus in (2, 8):
            runs = sorted(
                (run_leg(cpus, conf) for _ in range(args.runs)),
                key=lambda r: r["frontier"]["urls_per_sec"],
            )
            legs[cpus] = runs[len(runs) // 2]
        eff = round(
            (legs[8]["frontier"]["urls_per_sec"] / legs[2]["frontier"]["urls_per_sec"]) / 4.0,
            3,
        )
        results[name] = {
            "efficiency": eff,
            "ups": {c: legs[c]["frontier"]["urls_per_sec"] for c in legs},
            "wall": {c: legs[c]["frontier"]["frontier_wall_sec"] for c in legs},
            "job_ms": {c: legs[c]["frontier"]["job_ms_steady"] for c in legs},
            "steal": {c: legs[c]["steal_jiffies_leg"] for c in legs},
        }
        print(json.dumps({name: results[name]}), flush=True)

    print("\n== summary ==")
    for name, r in results.items():
        print(f"{name:14s} eff={r['efficiency']:.3f} "
              f"ups2={r['ups'][2]:.0f} ups8={r['ups'][8]:.0f} steal={r['steal']}")


if __name__ == "__main__":
    main()

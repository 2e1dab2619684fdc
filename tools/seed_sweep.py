"""Multi-seed oracle differential sweep (round-8 hardening tool).

For each seed: generate a full sf0.01-shaped twin with ``gen_reseed.py``,
run the complete ``check_oracle`` differential on it, report, and delete
the twin. Every query must hash-match its DuckDB oracle on EVERY seed —
any failure is a real engine/oracle disagreement that the canonical
seed-42 data happened to mask. This sweep has caught three such bugs:

- q129: Spark double math vs DuckDB DECIMAL literals rounding an x.xx5
  allocation in opposite directions (seed 31337),
- q199: the Spark side flagging MinHash docs at jaccard>=0.5 while the
  oracle embedded q23's 0.1-threshold pair SQL (seed 31337),
- q267: a LIMIT 50 cutting through structurally tied Adamic-Adar scores
  ranked on raw float sums — a per-run flake, not just cross-engine
  (seed 777, second run).

Usage: python tools/seed_sweep.py [seed ...]    (default: 777 5 99 20260815)
Exit code = total failures across all seeds.
"""

from __future__ import annotations

import shutil
import subprocess
import sys

DEFAULT_SEEDS = [777, 5, 99, 20260815]


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or DEFAULT_SEEDS
    total_fail = 0
    for seed in seeds:
        twin = f".scratch/sweep-{seed}"
        print(f"=== seed {seed} -> {twin}")
        subprocess.run(
            [sys.executable, "tools/gen_reseed.py", twin, str(seed)],
            check=True,
            capture_output=True,
        )
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", twin],
            capture_output=True,
            text=True,
        )
        lines = proc.stdout.splitlines()
        ok = sum(1 for ln in lines if ln.startswith("OK "))
        tol = sum(1 for ln in lines if ln.startswith("OK~"))
        fails = [ln for ln in lines if ln.startswith(("FAIL", "ERR"))]
        print(f"seed {seed}: ok={ok} tolerance={tol} fail={len(fails)}")
        for ln in fails[:10]:
            print("   " + ln)
        total_fail += len(fails)
        shutil.rmtree(twin, ignore_errors=True)
    print(f"sweep done: {total_fail} failures across {len(seeds)} seeds")
    return total_fail


if __name__ == "__main__":
    raise SystemExit(main())

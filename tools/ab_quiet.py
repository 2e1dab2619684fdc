"""Quiet-window interleaved A/B driver.

Same protocol as tools/ab_drive.sh (alternating ab_bench passes over two
trees) but each PAIR additionally waits for the 1-minute loadavg to fall
under a threshold before starting, because this sandbox's ambient load
swings between <0.5 and >15 on minute timescales and pairs measured in a
storm are unadjudicable even as interleaved minima (identical code has
measured 1.2x apart in a loaded window — evidence/ab_r13_regress_fix.jsonl).

Usage:
  python tools/ab_quiet.py <treeA> <labelA> <treeB> <labelB> <q1,q2,...> \
      <out.jsonl> <n_pairs> [load_gate]

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))


def wait_quiet(gate: float, max_wait_s: float = 1800.0) -> float:
    """Block until 1-min loadavg < gate (sampled every 20 s), or until
    max_wait_s has passed (returns anyway — a bounded wait beats never
    measuring). Returns the loadavg seen at release."""
    t0 = time.time()
    while True:
        load1 = os.getloadavg()[0]
        if load1 < gate or time.time() - t0 > max_wait_s:
            return load1
        time.sleep(20)


def main() -> None:
    tree_a, label_a, tree_b, label_b, qcsv, out, n_pairs = sys.argv[1:8]
    gate = float(sys.argv[8]) if len(sys.argv) > 8 else 2.0
    for i in range(int(n_pairs)):
        load1 = wait_quiet(gate)
        print(f"pair {i + 1}: starting at loadavg {load1:.2f}", flush=True)
        for tree, label in ((tree_a, label_a), (tree_b, label_b)):
            subprocess.run(
                [sys.executable, os.path.join(TOOLS, "ab_bench.py"),
                 tree, label, qcsv, out],
                stderr=subprocess.DEVNULL,
                check=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

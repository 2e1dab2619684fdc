"""Machine-write tests/full_scaling_allowlist.py from SCALING.md's
full-surface tier.

The full-surface scaling gate (tests/test_scaling_gate.py,
test_full_surface_ratios_within_committed_ceiling) enforces a committed
ceiling per query; with ~300 single-run rows the committed dict is
machine-written, and the CONSCIOUS REVIEW the gate exists to force happens
on the git diff of the regenerated file: a query whose committed ratio
jumps between rounds is exactly the thing to investigate before committing.

Usage: python tools/gen_full_allowlist.py   (after `dump_scaling.py --full`)
"""

from __future__ import annotations

import re
import sys


def main() -> None:
    text = open("SCALING.md").read()
    m = re.search(r"<!-- full-surface:begin -->(.*?)<!-- full-surface:end -->", text, re.S)
    if not m:
        sys.exit("SCALING.md has no full-surface tier; run dump_scaling.py --full first")
    rows: dict[str, float] = {}
    for line in m.group(1).splitlines():
        mm = re.match(r"\| (q\w+) \| [\d.]+ \| [\d.]+ \| ([\d.]+) \|", line)
        if mm:
            rows[mm.group(1)] = float(mm.group(2))
    if len(rows) < 200:
        sys.exit(f"only parsed {len(rows)} full-surface rows; refusing to shrink the gate")
    out = [
        '"""Committed full-surface x100 growth-ratio allowlist.',
        "",
        "Machine-written by `python tools/gen_full_allowlist.py` from the",
        "full-surface tier of SCALING.md (one warmed sf0.001 run + one sf0.1",
        "run per query). Consumed by tests/test_scaling_gate.py with ceiling",
        "max(committed * 1.5, committed + 2.0). Regenerate ONLY alongside a",
        "reviewed `python tools/dump_scaling.py --full` — the review is the",
        'git diff of this file. Do not edit by hand."""',
        "",
        "FULL_ALLOWLIST: dict[str, float] = {",
    ]
    for name in sorted(rows):
        out.append(f'    "{name}": {rows[name]:.1f},')
    out.append("}")
    with open("tests/full_scaling_allowlist.py", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote tests/full_scaling_allowlist.py ({len(rows)} entries)")


if __name__ == "__main__":
    main()

"""Merge the per-pair scaling JSONs into BENCH_SCALING.json and print the
BASELINE.md table rows.

    python scripts/record_scaling.py /tmp/scaling_4_16.json /tmp/scaling_8_32.json
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    pairs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            pairs.append(json.load(f))
    out = {"metric": "scaling_efficiency_pairs", "pairs": pairs}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    for p in pairs:
        lo, hi = p["cpus"]
        print(
            f"| {lo} -> {hi} CPUs | {p['value']} | "
            f"{p[f'turns_per_sec_{lo}']:.0f} -> {p[f'turns_per_sec_{hi}']:.0f} turns/s "
            f"(build {p[f'build_sec_{lo}']:.0f} s -> {p[f'build_sec_{hi}']:.0f} s) |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

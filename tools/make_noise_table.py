#!/usr/bin/env python3
"""Generate tools/bench_noise.json — the measured same-build amplitude
table bench_gate.py reads its per-query exemptions from.

Usage:
    python3 tools/make_noise_table.py run1.json run2.json run3.json ...

Inputs are >=3 graft.Bench output files from the SAME build on the SAME
machine (full suite, same SF). Amplitude per query = max/min across the
runs: the swing a min-of-2 sample can show with zero code change. The
gate then only flags ratios EXCEEDING that measured band (and an
absolute-delta floor) — data instead of prose adjudication, per the r9
verdict's gate redesign.

The table records its own provenance (run files, build commit, date) so
a stale table is auditable.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    paths = sys.argv[1:]
    if len(paths) < 3:
        print("make_noise_table: need >=3 same-build Bench run files")
        return 2
    runs = []
    for p in paths:
        with open(p) as f:
            data = json.load(f)
        runs.append({k: v for k, v in data["queries"].items() if v > 0})
    shared = set(runs[0])
    for r in runs[1:]:
        shared &= set(r)
    amp = {}
    for q in sorted(shared):
        vals = [r[q] for r in runs]
        amp[q] = round(max(vals) / min(vals), 3)
    try:
        commit = subprocess.check_output(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        commit = "unknown"
    out = {
        "_provenance": {
            "runs": [os.path.basename(p) for p in paths],
            "n_runs": len(paths),
            "build_commit": commit,
            "note": "amplitude = max/min per query across same-build "
                    "full-suite graft.Bench runs; see tools/bench_gate.py",
        },
        "amplitude": amp,
    }
    dst = os.path.join(ROOT, "tools", "bench_noise.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    big = {q: a for q, a in amp.items() if a > 1.3}
    print(f"wrote {dst}: {len(amp)} queries, {len(big)} with amplitude >1.3x")
    for q, a in sorted(big.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {q}: {a}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Bench regression gate: diff two BENCH_r*.json files per query and flag
regressions beyond a threshold.

Usage:
    python3 tools/bench_gate.py [BENCH_prev.json BENCH_new.json] [--threshold 1.3]

With no file arguments, picks the two highest-numbered BENCH_r*.json in
the repo root. Exit code 1 if any flagged regression is NOT narrated in
BENCH_NOTES.md. Narrated = the query name appears in the NEWEST
"## Round N" section of the notes (convention: newest round first) —
mentions in older rounds do not exempt new regressions. Silent
regressions are how engines rot; deliberate ones must be written down
in the current round's section.
"""
import json
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    """Accepts either the raw Bench JSON line ({"metric":...,"queries":{...}})
    or the driver's wrapper, which embeds that line inside a "tail" field of
    captured stdout."""
    with open(path) as f:
        data = json.load(f)
    if "queries" not in data and "tail" in data:
        tail = data["tail"]
        start = tail.rfind('{"metric"')
        if start >= 0:
            end = tail.find("\n", start)
            data = json.loads(tail[start:] if end < 0 else tail[start:end])
        else:
            # the driver caps 'tail' length and can cut the line's head off;
            # salvage whatever per-query pairs survive
            pairs = re.findall(r'"(q\w+)":(-?[0-9.]+)', tail)
            if not pairs:
                raise ValueError(f"{path}: no embedded bench JSON found in 'tail'")
            data = {"queries": {q: float(v) for q, v in pairs}}
    return {k: v for k, v in data.get("queries", {}).items() if v >= 0}


def main():
    argv = sys.argv[1:]
    args, threshold = [], 1.3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                threshold = float(argv[i])
            else:
                print("bench_gate: --threshold requires a value")
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) >= 2:
        prev_path, new_path = args[0], args[1]
    else:
        benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if len(benches) < 2:
            print("bench_gate: need at least two BENCH_r*.json files")
            return 0
        prev_path, new_path = benches[-2], benches[-1]
    prev, new = load(prev_path), load(new_path)
    # Narration scope: only the NEWEST round section of BENCH_NOTES.md
    # (convention: newest "## Round N" first). Matching the whole file
    # would permanently exempt any query ever mentioned in a past round.
    notes = ""
    noise_mult = {}
    notes_path = os.path.join(ROOT, "BENCH_NOTES.md")
    if os.path.exists(notes_path):
        whole = open(notes_path).read()
        sections = re.split(r"(?m)^## ", whole)
        notes = next((s for s in sections if s.startswith("Round")), whole)
        # Standing "Expected noise" annotations: eager multi-job queries
        # (iterative loops, sketch builds) whose single-shot timings swing
        # with scheduler load get a per-query threshold multiplier — e.g.
        # "- q65_neardup_groups 3x — ...". Beyond the widened bound they
        # still flag and still need narration.
        noise_sec = next((s for s in sections if s.startswith("Expected noise")), "")
        for q, f in re.findall(r"(?m)^-\s+(\w+)\s+([\d.]+)x", noise_sec):
            noise_mult[q] = float(f)

    print(f"bench_gate: {os.path.basename(prev_path)} -> {os.path.basename(new_path)} "
          f"(threshold {threshold}x)")
    shared = sorted(set(prev) & set(new))
    tp = sum(prev[q] for q in shared)
    tn = sum(new[q] for q in shared)
    if tp > 0:
        print(f"shared {len(shared)} queries: {tp:.2f}s -> {tn:.2f}s "
              f"({(tn - tp) / tp:+.1%} vs prev)")
    silent = []
    for q in shared:
        ratio = new[q] / prev[q] if prev[q] > 0 else float("inf")
        eff = threshold * noise_mult.get(q, 1.0)
        # absolute floor: sub-300ms queries are dominated by job-submit
        # latency; ratios there are noise, not plan regressions
        if ratio > eff and new[q] - prev[q] > 0.3:
            narrated = q.split("_")[0] in notes
            tag = "narrated" if narrated else "SILENT"
            noisy = f", noise-tolerant {eff:.1f}x" if q in noise_mult else ""
            print(f"  REGRESSION {q}: {prev[q]:.2f}s -> {new[q]:.2f}s "
                  f"({ratio:.2f}x{noisy}) [{tag}]")
            if not narrated:
                silent.append(q)
    added = sorted(set(new) - set(prev))
    removed = sorted(set(prev) - set(new))
    if added:
        print(f"new queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if silent:
        print(f"FAIL: {len(silent)} silent regression(s) — narrate them in BENCH_NOTES.md")
        return 1
    print("OK: no silent regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Plan-shape regression gate: diff the per-query physical-plan shape
counts (Exchange / BroadcastHashJoin / SortMergeJoin / Expand /
nested-loop) between two PLAN_AUDIT.md files and fail on unnarrated
changes — the structural analogue of bench_gate.py. A timing gate can
miss a plan regression hidden inside run-to-run noise; a shape diff
cannot: an extra Exchange or a BHJ→SMJ demotion shows up as an integer,
deterministically, at any machine load.

Usage:
    python3 tools/plan_gate.py [OLD.md NEW.md]

With no arguments, compares the last COMMITTED PLAN_AUDIT.md
(`git show HEAD:PLAN_AUDIT.md`) against the working-tree file — the
round-close flow: regenerate PLAN_AUDIT.md, run this gate, narrate any
flagged query in BENCH_NOTES.md's newest round section, then commit.

Codegen ratios are reported but NOT gated: operator totals legitimately
move with added projections while the shuffle/join structure is what
scale lives or dies on. New/removed queries are informational.

Exit 1 only if a query's shape-count change is not narrated (query name
in the NEWEST "## Round N" section of BENCH_NOTES.md — same convention
as bench_gate.py).
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHAPE_COLS = ["Exchange", "BHJ", "SMJ", "Expand", "nested-loop"]


def parse(text):
    """PLAN_AUDIT table rows -> {query: (ex, bhj, smj, expand, nlj)}."""
    out = {}
    for line in text.splitlines():
        m = re.match(
            r"\|\s*(\w+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|"
            r"\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)/(\d+)\s*\|", line)
        if m:
            out[m.group(1)] = tuple(int(m.group(i)) for i in range(2, 7))
    return out


def main():
    args = sys.argv[1:]
    if len(args) >= 2:
        old_text = open(args[0]).read()
        new_text = open(args[1]).read()
        old_name, new_name = args[0], args[1]
    else:
        try:
            old_text = subprocess.check_output(
                ["git", "-C", ROOT, "show", "HEAD:PLAN_AUDIT.md"],
                text=True, stderr=subprocess.DEVNULL)
        except subprocess.CalledProcessError:
            print("plan_gate: no committed PLAN_AUDIT.md baseline — OK")
            return 0
        new_text = open(os.path.join(ROOT, "PLAN_AUDIT.md")).read()
        old_name, new_name = "HEAD:PLAN_AUDIT.md", "PLAN_AUDIT.md"
    old, new = parse(old_text), parse(new_text)
    if not old or not new:
        print(f"plan_gate: could not parse a table "
              f"(old={len(old)} rows, new={len(new)} rows)")
        return 2

    notes = ""
    notes_path = os.path.join(ROOT, "BENCH_NOTES.md")
    if os.path.exists(notes_path):
        sections = re.split(r"(?m)^## ", open(notes_path).read())
        notes = next((s for s in sections if s.startswith("Round")), "")

    print(f"plan_gate: {old_name} -> {new_name} "
          f"({len(old)} -> {len(new)} audited plans)")
    silent = []
    for q in sorted(set(old) & set(new)):
        if old[q] != new[q]:
            diff = ", ".join(
                f"{c} {a}->{b}" for c, a, b in
                zip(SHAPE_COLS, old[q], new[q]) if a != b)
            narrated = q.split("_")[0] in notes
            tag = "narrated" if narrated else "SILENT"
            print(f"  SHAPE CHANGE {q}: {diff} [{tag}]")
            if not narrated:
                silent.append(q)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"new queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if silent:
        print(f"FAIL: {len(silent)} unnarrated plan-shape change(s) — "
              f"narrate them in BENCH_NOTES.md's newest round section")
        return 1
    print("OK: no silent plan-shape changes")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Bench regression gate: diff two BENCH_r*.json files per query and flag
regressions beyond a threshold.

Usage:
    python3 tools/bench_gate.py [BENCH_prev.json BENCH_new.json]
        [--threshold 1.3] [--min-delta 0.5]

With no file arguments, picks the two highest-numbered BENCH_r*.json in
the repo root.

Flagging rule (both conditions must hold — r9 verdict's gate redesign):
  1. ratio new/prev > max(--threshold, measured same-build amplitude)
  2. absolute delta new-prev > --min-delta seconds

The per-query amplitude comes from tools/bench_noise.json — a MEASURED
table (max/min over >=3 full-suite runs of one build on one machine),
regenerated per round by tools/make_noise_table.py, not prose. A query
whose same-build swing is 3x cannot meaningfully flag at 1.3x; one whose
swing is 1.05x can. The absolute floor exists because driver tails are
recorded on a loaded machine where sub-second queries routinely double
without any code change (r8: q79 4.16x, r9: q96 3.67x / q98 2.35x — all
judge-adjudicated noise); a plan regression that matters at 100 TB moves
seconds, not tenths.

Exit code 1 only if a flagged regression is NOT narrated in
BENCH_NOTES.md AND NOT adjudicated in tools/adjudications.json.
Narrated = the query name appears in the NEWEST "## Round N" section of
the notes (convention: newest round first) — mentions in older rounds
do not exempt new regressions. Adjudicated = the cumulative ledger has
an entry matching the query AND the exact round-pair being compared
(derived from the BENCH_rNN.json file names): the driver tail is
recorded after round close, so its flags structurally CANNOT be
narrated in that round's notes — the next round (or the judge) appends
the adjudication to the ledger instead. Per-pair matching keeps the
exemption narrow: a later genuine regression on the same query still
flags. Silent regressions are how engines rot; deliberate ones must be
written down.
"""
import json
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path, prefer_close_runs=True):
    """Accepts either the raw Bench JSON line ({"metric":...,"queries":{...}})
    or the driver's wrapper, which embeds that line inside a "tail" field of
    captured stdout.

    Preference order (r12 verdict, What's wrong #4): if the path is a
    driver-recorded BENCH_rNN.json AND the repo has a committed full
    close-run for the same round (tools/close_run_rNN.json — the complete
    per-query Bench JSON captured at round close on an idle machine), use
    the close run instead. The driver tail truncates to the last ~60
    queries and is recorded under suite load; the close run covers all
    queries of the same build, so the gate compares like with like and
    sees the full surface.

    CAVEAT the substitution note makes visible: the close run reflects the
    build at round CLOSE. If a BENCH_rNN.json was re-recorded later against
    a changed build, the stale close run would mask it — pass
    --no-close-runs to gate on the input files exactly as given."""
    m = re.search(r"BENCH_(r\d+)\.json$", os.path.basename(path))
    if m and prefer_close_runs:
        close = os.path.join(ROOT, "tools", f"close_run_{m.group(1)}.json")
        if os.path.exists(close):
            print(f"bench_gate: using committed close run for {m.group(1)} "
                  f"({os.path.relpath(close, ROOT)}; --no-close-runs to disable)")
            path = close
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
    args, threshold, min_delta = [], 1.3, 0.5
    prefer_close = True
    if "--no-close-runs" in argv:
        prefer_close = False
        argv = [a for a in argv if a != "--no-close-runs"]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold") or a.startswith("--min-delta"):
            key = "--threshold" if a.startswith("--threshold") else "--min-delta"
            if "=" in a:
                val = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                val = float(argv[i])
            else:
                print(f"bench_gate: {key} requires a value")
                return 2
            if key == "--threshold":
                threshold = val
            else:
                min_delta = val
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
    prev, new = load(prev_path, prefer_close), load(new_path, prefer_close)
    # Narration scope: only the NEWEST round section of BENCH_NOTES.md
    # (convention: newest "## Round N" first). Matching the whole file
    # would permanently exempt any query ever mentioned in a past round.
    notes = ""
    notes_path = os.path.join(ROOT, "BENCH_NOTES.md")
    if os.path.exists(notes_path):
        whole = open(notes_path).read()
        sections = re.split(r"(?m)^## ", whole)
        notes = next((s for s in sections if s.startswith("Round")), whole)
    # Measured same-build amplitude table (query -> max/min ratio across
    # >=3 full-suite runs of ONE build). Data, not narrative: regenerate
    # with tools/make_noise_table.py after any substantial change.
    noise = {}
    noise_path = os.path.join(ROOT, "tools", "bench_noise.json")
    if os.path.exists(noise_path):
        with open(noise_path) as f:
            tbl = json.load(f)
        noise = {q: float(v) for q, v in tbl.get("amplitude", tbl).items()
                 if isinstance(v, (int, float))}
    # Cumulative adjudication ledger: (query, round-pair) -> verdict.
    # The round-pair key comes from the BENCH file names so an entry
    # exempts exactly one comparison, never the query wholesale.
    def round_tag(path):
        m = re.search(r"BENCH_(r\d+)\.json$", os.path.basename(path))
        return m.group(1) if m else os.path.basename(path)

    pair = f"{round_tag(prev_path)}->{round_tag(new_path)}"
    adjudicated = {}
    ledger_path = os.path.join(ROOT, "tools", "adjudications.json")
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            ledger = json.load(f)
        for e in ledger.get("entries", []):
            if e.get("rounds") == pair:
                adjudicated[e["query"]] = e.get("verdict", "noise")

    print(f"bench_gate: {os.path.basename(prev_path)} -> {os.path.basename(new_path)} "
          f"(ratio > max({threshold}x, measured amplitude) AND delta > {min_delta}s)")
    shared = sorted(set(prev) & set(new))
    tp = sum(prev[q] for q in shared)
    tn = sum(new[q] for q in shared)
    if tp > 0:
        print(f"shared {len(shared)} queries: {tp:.2f}s -> {tn:.2f}s "
              f"({(tn - tp) / tp:+.1%} vs prev)")
    silent = []
    for q in shared:
        ratio = new[q] / prev[q] if prev[q] > 0 else float("inf")
        eff = max(threshold, noise.get(q, 1.0))
        if ratio > eff and new[q] - prev[q] > min_delta:
            narrated = q.split("_")[0] in notes
            if narrated:
                tag = "narrated"
            elif q in adjudicated:
                tag = f"adjudicated:{adjudicated[q]} ({pair})"
            else:
                tag = "SILENT"
            amp = f", amplitude {noise[q]:.2f}x" if q in noise else ""
            print(f"  REGRESSION {q}: {prev[q]:.2f}s -> {new[q]:.2f}s "
                  f"({ratio:.2f}x{amp}) [{tag}]")
            if not narrated and q not in adjudicated:
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

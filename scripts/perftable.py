#!/usr/bin/env python3
"""Regenerate PERFTABLE.md — THE per-headline performance record (round-11
verdict directive: one committed table instead of perf claims scattered
across BENCHFULL/BENCHISO/BENCH_SF1/scaladoc; scaladoc perf claims cite
this file).

Merges, per headline query:
  - BENCHFULL.json   in-suite sf0.1 wall (3-rep median, one shared JVM)
  - BENCHISO.json    isolated sf0.1 wall + process-cpu (fresh JVM per query)
  - BENCH_SF1.json   in-suite sf1 wall (1 rep)
  - BENCHISO_SF1.json isolated sf1 wall (fresh JVM per query), if present

Usage: python3 scripts/perftable.py [round_label]   (run from repo root)
"""
import json
import os
import sys

ROUND = sys.argv[1] if len(sys.argv) > 1 else "current"


def load(path):
    if not os.path.exists(path):
        return {}
    return json.load(open(path))


full = load("BENCHFULL.json")
iso = load("BENCHISO.json")
sf1 = load("BENCH_SF1.json")
iso1 = load("BENCHISO_SF1.json")

headline = list(iso.get("queries", {}).keys())


def fmt(d, q, key="queries"):
    v = d.get(key, {}).get(q)
    return f"{v:.2f}" if isinstance(v, (int, float)) else "—"


lines = [
    f"# PERFTABLE — per-headline query performance record (round {ROUND})",
    "",
    "Regenerated per round by `python3 scripts/perftable.py <round>` from the",
    "four committed bench records. THIS file is the citation target for any",
    "perf claim in scaladoc or SURVEY — one table, four protocols, no",
    "cross-referencing. Protocol meanings:",
    "",
    "- **in-suite sf0.1** (BENCHFULL.json): 3-rep median, all registered",
    "  queries back-to-back in ONE JVM — carries JVM/GC/cache state of the",
    "  whole suite; the driver-comparable number.",
    "- **iso sf0.1** (BENCHISO.json): fresh JVM per query, 3-rep median —",
    "  the plan's own cost, no suite state. `iso cpu` is whole-process CPU",
    "  seconds (driver + all local[32] executor threads + GC).",
    "- **in-suite sf1** (BENCH_SF1.json): 1 rep at the 10x self-generated",
    "  scale (SCALECHECK.md) — the scale-trend signal.",
    "- **iso sf1** (BENCHISO_SF1.json): fresh JVM per query at sf1.",
    "",
    "A real plan regression moves BOTH the in-suite and isolated columns;",
    "a move in only one column is protocol noise (JVM state or box drift —",
    "see the bench-noise notes in VERDICT/ADVICE history).",
    "",
    "| query | in-suite sf0.1 s | iso sf0.1 s | iso sf0.1 cpu-s | in-suite sf1 s | iso sf1 s |",
    "|---|---|---|---|---|---|",
]
for q in headline:
    lines.append(
        f"| `{q}` | {fmt(full, q)} | {fmt(iso, q)} | {fmt(iso, q, 'cpu_s')} "
        f"| {fmt(sf1, q)} | {fmt(iso1, q)} |")

lines += [
    "",
    f"Suite totals: in-suite sf0.1 {full.get('value', '—')} s over "
    f"{len(full.get('queries', {}))} queries (reps={full.get('reps', '?')}, "
    f"spill={full.get('spilled_bytes', '?')} B, "
    f"load1 before/after {full.get('load1_before', '?')}/"
    f"{full.get('load1_after', '?')}); "
    f"isolated sf0.1 {iso.get('value', '—')} s over "
    f"{iso.get('n_queries', '?')} headliners; "
    f"in-suite sf1 {sf1.get('value', '—')} s over "
    f"{len(sf1.get('queries', {}))} queries.",
    "",
]
with open("PERFTABLE.md", "w") as f:
    f.write("\n".join(lines))
print(f"PERFTABLE.md written: {len(headline)} headline rows, round {ROUND}")

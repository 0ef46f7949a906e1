#!/usr/bin/env python3
"""Generate SCALECHECK10.md — the sf1 -> sf10 scaling-exponent tables —
from the committed records (round-15 verdict directive 1; round-17 added
the skewed decade, round-16 verdict directive 3).

Inputs, uniform decade: BENCH_SF1.json / BENCHISO_SF1.json (full-registry /
headline records at sf1) and BENCH_SF10.json / BENCHISO_SF10.json (the
declared scale-critical subset at sf10, captured by scripts/bench_sf10.sh).
Skewed decade (optional — emitted only when all four exist):
BENCH_SF1SKEW.json / BENCHISO_SF1SKEW.json and BENCH_SF10SKEW.json /
BENCHISO_SF10SKEW.json (the skew-critical subset on the --skew corpora,
captured by scripts/bench_sf10skew.sh).

For every query in the sf10 subset:
  raw ratio      = t_sf10 / t_sf1                      (per protocol)
  norm ratio     = raw ratio / (canary10 / canary1)    (box-drift removed
                   via each record's pinned range_mod_sum_s CPU canary)
  exponent       = log10(norm ratio)   -- 1.0 = linear in data, <1 sub-
                   linear, >1 super-linear per decade
Queries whose normalized exponent exceeds 1.2 in EITHER column (suite or
iso) are flagged: each flag needs a plan fix or a documented bound in
SCALECHECK10.md (the round-15 verdict's done-criterion; round-17 widened
the flag from suite-only to max(suite, iso) because a canary-hot in-suite
capture deflates suite exponents — the iso column is the trustworthy one).

A record pair whose canary drift deviates from 1.0 beyond CANARY_DRIFT_MAX
(1.3x either way) gets a loud WARNING in the output and the generated
table: normalization corrects first-order box drift but a 1.3x+ hot/cold
capture is outside the band where that correction is trustworthy —
recapture instead of trusting the normalized numbers.

Usage: python3 scripts/scalecheck10.py <round>
Writes SCALECHECK10.md (each table section between its AUTOGEN markers is
replaced; prose outside them is preserved so documented bounds survive
regeneration).
"""
import json
import math
import sys
from pathlib import Path

ROUND = sys.argv[1] if len(sys.argv) > 1 else "?"
ROOT = Path(__file__).resolve().parent.parent
EXPONENT_FLAG = 1.2
CANARY_DRIFT_MAX = 1.3  # beyond this, normalization is untrustworthy: recapture


def load(name):
    p = ROOT / name
    if not p.exists():
        return None
    with open(p) as f:
        return json.load(f)


def canary(rec):
    return rec["canary"]["range_mod_sum_s"]


def section(tag_suffix, title, sf1_full, sf1_iso, sf10_full, sf10_iso):
    """Build one decade's AUTOGEN block; returns (lines, n_rows, n_flags)."""
    drift_full = canary(sf10_full) / canary(sf1_full)
    drift_iso = canary(sf10_iso) / canary(sf1_iso)

    # ADVICE r16 #1: a drift far from 1.0 means one capture of the pair ran
    # on a much hotter/colder box than the other; the linear normalization
    # below is only a first-order correction, so warn loudly instead of
    # silently normalizing it away.
    drift_warnings = []
    for tag, drift in (("in-suite", drift_full), ("iso", drift_iso)):
        if drift > CANARY_DRIFT_MAX or drift < 1.0 / CANARY_DRIFT_MAX:
            drift_warnings.append(
                f"WARNING: {tag} record pair canary drift {drift:.2f}x exceeds the "
                f"{CANARY_DRIFT_MAX}x trust band — normalized numbers below are "
                f"suspect; recapture the drifted record instead of trusting them.")
    for w in drift_warnings:
        print(w, file=sys.stderr)

    def row(q):
        out = {"query": q}
        for tag, lo, hi, drift in (("suite", sf1_full, sf10_full, drift_full),
                                   ("iso", sf1_iso, sf10_iso, drift_iso)):
            t1, t10 = lo["queries"].get(q), hi["queries"].get(q)
            if t1 is None or t10 is None or t1 <= 0:
                out[tag] = None
                continue
            raw = t10 / t1
            norm = raw / drift
            out[tag] = {"t1": t1, "t10": t10, "raw": raw, "norm": norm,
                        "exp": math.log10(norm) if norm > 0 else float("nan")}
        return out

    queries = sorted(sf10_full["queries"].keys())
    rows = [row(q) for q in queries]

    def flagged(r):
        # ADVICE r16 #1: flag on the max of the suite and iso exponents — a
        # canary-hot in-suite capture deflates suite exponents, so a plan can
        # only pass if BOTH views stay under the bar.
        exps = [r[tag]["exp"] for tag in ("suite", "iso") if r[tag]]
        return bool(exps) and max(exps) > EXPONENT_FLAG

    flags = [r for r in rows if flagged(r)]
    # ADVICE r16 #2: a query missing from either record renders '-' and could
    # never be flagged — surface it instead of skipping it.
    incomplete = [r["query"] for r in rows if r["suite"] is None or r["iso"] is None]

    lines = []
    lines.append(f"<!-- AUTOGEN{tag_suffix} round {ROUND} scripts/scalecheck10.py -->")
    lines.append("")
    lines.append(f"## Canary drift between the {title} captures")
    lines.append("")
    lines.append("| record pair | range_mod_sum_s sf1 | sf10 | drift x |")
    lines.append("|---|---|---|---|")
    lines.append(f"| in-suite | {canary(sf1_full):.2f} | {canary(sf10_full):.2f} | {drift_full:.2f} |")
    lines.append(f"| iso | {canary(sf1_iso):.2f} | {canary(sf10_iso):.2f} | {drift_iso:.2f} |")
    lines.append("")
    for w in drift_warnings:
        lines.append(f"**{w}**")
        lines.append("")
    lines.append("All ratios below are canary-normalized (divided by the drift")
    lines.append("column), so they compare PLANS, not box states.")
    lines.append("")
    lines.append(f"## Per-query scaling, {title} (10x data)")
    lines.append("")
    lines.append("exp = log10(normalized ratio): 1.0 = linear per decade, < 1")
    lines.append(f"sublinear, > {EXPONENT_FLAG} flagged (plan fix or documented bound).")
    lines.append("")
    lines.append("| query | suite sf1 s | suite sf10 s | suite ratio | suite exp | iso sf1 s | iso sf10 s | iso ratio | iso exp |")
    lines.append("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        s, i = r["suite"], r["iso"]

        def cells(d):
            if d is None:
                return ["-"] * 4
            return [f"{d['t1']:.2f}", f"{d['t10']:.2f}", f"{d['norm']:.2f}x", f"{d['exp']:.2f}"]
        flag = " **FLAG**" if flagged(r) else ""
        lines.append("| `" + r["query"] + "`" + flag + " | " +
                     " | ".join(cells(s) + cells(i)) + " |")
    lines.append("")
    # ADVICE r16 #2: compute both totals over the intersection of queries
    # present in ALL FOUR records so the headline ratio compares the same set.
    common = [q for q in queries
              if all(q in rec["queries"] for rec in (sf1_full, sf1_iso, sf10_full, sf10_iso))]
    total1 = sum(sf1_full["queries"][q] for q in common)
    total10 = sum(sf10_full["queries"][q] for q in common)
    lines.append(f"Subset totals (in-suite, over the {len(common)}-query intersection "
                 f"present in all four records): {total1:.1f} s at sf1 -> {total10:.1f} s "
                 f"at sf10 raw ({total10 / total1:.2f}x for 10x data; "
                 f"{total10 / total1 / drift_full:.2f}x canary-normalized).")
    lines.append("")
    if incomplete:
        lines.append("**Incomplete coverage (present in BENCH_SF10 but missing an "
                     "sf1 or iso counterpart, so never flaggable):** " +
                     ", ".join("`" + q + "`" for q in incomplete) +
                     " — capture the missing record or drop the query from the subset.")
        lines.append("")
    if flags:
        lines.append(f"**Flagged (max(suite, iso) exp > {EXPONENT_FLAG}):** " +
                     ", ".join("`" + r["query"] + "`" for r in flags) +
                     " — each needs a plan fix or a documented bound below.")
    else:
        lines.append(f"**No query exceeds the {EXPONENT_FLAG} exponent flag in either column.**")
    lines.append("")
    lines.append(f"<!-- /AUTOGEN{tag_suffix} -->")
    return lines, len(rows), len(flags)


def splice(text, tag_suffix, block):
    # ADVICE r17 #2: the uniform start marker must not be a PREFIX of the
    # skew one ("<!-- AUTOGEN" matches "<!-- AUTOGEN-SKEW" first if the
    # skew block ever precedes the uniform block) — anchor on the space
    # before "round", which the suffixed marker never has at that offset
    start_marker = f"<!-- AUTOGEN{tag_suffix} round"
    end_marker = f"<!-- /AUTOGEN{tag_suffix} -->"
    start = text.find(start_marker)
    end = text.find(end_marker, start if start >= 0 else 0)
    if start >= 0 and end >= 0:
        return text[:start] + block + text[end + len(end_marker):]
    return text + "\n" + block + "\n"


uniform = [load(n) for n in ("BENCH_SF1.json", "BENCHISO_SF1.json",
                             "BENCH_SF10.json", "BENCHISO_SF10.json")]
if any(r is None for r in uniform):
    sys.exit("missing uniform-decade records — run scripts/bench_sf10.sh")
block, n_rows, n_flags = section("", "sf1 -> sf10", *uniform)

md = ROOT / "SCALECHECK10.md"
text = md.read_text() if md.exists() else ""
text = splice(text, "", "\n".join(block))

skew = [load(n) for n in ("BENCH_SF1SKEW.json", "BENCHISO_SF1SKEW.json",
                          "BENCH_SF10SKEW.json", "BENCHISO_SF10SKEW.json")]
n_rows_sk = n_flags_sk = 0
if all(r is not None for r in skew):
    block_sk, n_rows_sk, n_flags_sk = section(
        "-SKEW", "skewed sf1 -> skewed sf10 (--skew corpora)", *skew)
    text = splice(text, "-SKEW", "\n".join(block_sk))
elif any(r is not None for r in skew):
    print("WARNING: partial skew record set — skew section not regenerated",
          file=sys.stderr)

md.write_text(text)
print(f"SCALECHECK10.md written (uniform: {n_rows} queries, {n_flags} flagged"
      + (f"; skew: {n_rows_sk} queries, {n_flags_sk} flagged" if n_rows_sk else "")
      + ")")

#!/usr/bin/env bash
# Differential fuzz sweep: generate seeded random Spark/DuckDB query pairs
# (graft.Fuzz), execute the Spark side, compare via the same check.py gate
# the driver's correctness machinery replicates.
#
# Usage: scripts/fuzz.sh [seed] [n] [sfDir] [outDir]
# Round-16 dedicated dedup sweep: SPARK_GRAFT_FUZZ_DEDUP_ONLY=1 makes all
# n draws DedupParamGen draws — ran 4 seeds (42/7/1337/2026) × 50 at
# sf0.01: 200/200 green, 0 spark failures, 0 empties (SURVEY §5).
# Committed baseline: seeds 42/7/1337/2026 × (150 relational + 18
# dedup-parameter draws) — 672/672 green at sf0.01 (re-swept 2026-08-15
# when graft.Fuzz gained the n/8 DedupParamGen draws: span-window size ×
# df cap, ngram threshold × df cap, simhash 8/16/32-bit chunk splits ×
# bucket cap × hamming cut, SRP 4–12-bit md5-Rademacher widths, winnow
# 4–16-char gram lengths, and integer-IVF cluster/Lloyd-depth/probe
# combinations with the oracle's Lloyd CTEs unrolled per draw; re-swept
# again the same day when the family set grew to EIGHT with the
# integer-exact SemDeDup draws (cluster count × Lloyd depth × probe
# depth × rounded-cosine τ) and IVF-PQ draws (coarse count × shared
# Lloyd depth × subspace split m ∈ {4,8,16} × codebook size × probe
# depth × ADC-shortlist length, BOTH Lloyd chains unrolled per draw) —
# 72 parameter points hash-checked vs DuckDB on top of the prior protocol;
# an extra-assurance DEEP sweep at 4 × (250 relational + 31 dedup
# draws) = 1124/1124 also ran green the same day, covering additional
# PQ/SemDeDup parameter points beyond the committed 4×168 baseline:
# direction-regime latest-row draws:
# rn<=1 picks now draw all-ASC/min_by, all-DESC/max_by, or MIXED
# directions; fired draws [*_lrw] REQUIRE LatestByRule's argmax in the
# optimized plan, mixed draws [*_lrg] REQUIRE the guard to decline —
# this sweep: 8 fired + 4 declined across the four seeds, all
# value-green either way)
# over the eight-table surface (orders/lineitem/
# customer/part/supplier/nation/events/documents), covering projection
# (mixed-direction
# ORDER BY) / DISTINCT / aggregate / HAVING / DECIMAL discounted sums /
# exact interpolated quantiles (percentile vs quantile_cont, both on a
# 1e-6 grid: the engines' interpolation FORMULAS differ by ulps —
# a + f*(b-a) vs (1-f)*a + f*b — caught by this fuzzer, seed 1337) /
# NULLIF-planted NULLs (null propagation through projections and
# ORDER BY, null-skipping SUM/COUNT, all-null groups) /
# EXISTS / set-op / windowed-top-k / as-of join (ScaleOps.asofJoin vs
# DuckDB max_by) / binned range join (random bin widths vs binless
# oracle, half the draws through the declarative band join rewritten by
# RangeBinJoinRule) / interval-overlap join (ScaleOps.intervalBinJoin,
# random window geometry and bin widths vs the binless overlap oracle) /
# salted join (vs plain equi-join) / ROLLUP / CUBE /
# random GROUPING SETS / CASE WHEN / COALESCE /
# date_trunc shapes; seed 42 also 150/150 at sf0.1, and fresh-seed
# confirmation sweeps (seed 555 × 200 on 2026-08-13; seed 888 × 200 on
# 2026-08-14, with the windowed-quantile draw) both 200/200 green.
set -euo pipefail
SEED=${1:-42}
N=${2:-120}
SF=${3:-/root/testdata/sf0.01}
OUT=${4:-/tmp/graft_fuzz_$SEED}
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Fuzz $SEED $N $SF $OUT"
python3 scripts/check.py "$SF" "$OUT"

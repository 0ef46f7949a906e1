#!/usr/bin/env bash
# Canonical bench refresh (round-13 verdict directives 1–3): regenerates
# the bench records and then PERFTABLE.md LAST, in one script, so the
# table can never again disagree with the records it unifies (r13 shipped
# PERFTABLE generated one commit before the final BENCHFULL refresh —
# pagerank 7.32 vs 11.95 s in the same tree). Every record now carries
# the pinned CANARY pair (graft.Bench.runCanary) for cross-record drift
# normalization.
#
# Usage: scripts/refresh_bench.sh <round> [sf1_dir]
#   <round>   label stamped into PERFTABLE.md
#   [sf1_dir] optional self-generated sf1 corpus (scripts/gen_sf.py);
#             when present, BENCH_SF1.json + BENCHISO_SF1.json refresh too.
#
# Order matters: sf1 runs FIRST (their outputs are renamed aside), the
# sf0.1 runs land in BENCHFULL.json/BENCHISO.json afterwards, and
# perftable.py is the unconditional LAST step. Commit all refreshed
# records + PERFTABLE.md atomically.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND=${1:?usage: scripts/refresh_bench.sh <round> [sf1_dir]}
SF1=${2:-}
SF01=${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}

echo "[refresh] compile gate"
sbt -batch Test/compile

if [ -n "$SF1" ] && [ -d "$SF1" ]; then
  # 3-rep interleaved medians at sf1 too (was 1 rep through r13): the
  # first r14 capture proved single-rep fragility — one burst put a
  # 3.9 s query at 25 s with nothing to discard it. The iso children
  # keep their default in-child 3-rep median (do NOT export REPS=1 here:
  # a 1-rep fresh-JVM child measures JIT warmup, not the plan — the
  # r13→r14 "uniform 2.5×" iso-sf1 artifact).
  # Each pass writes its own record file directly (SPARK_GRAFT_BENCH_OUT);
  # the old write-then-mv left BENCHFULL.json holding sf1 numbers when the
  # script died between the two steps (round-14 advice).
  echo "[refresh] sf1 in-suite (3-rep interleaved medians) from $SF1"
  SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json \
    sbt -batch "runMain graft.Bench"
  echo "[refresh] sf1 isolated (fresh JVM per headliner, in-child 3-rep median)"
  SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_BENCH_OUT=BENCHISO_SF1.json \
    sbt -batch "runMain graft.BenchIsolated"
fi

echo "[refresh] sf0.1 in-suite (3-rep interleaved medians) from $SF01"
SPARK_GRAFT_SF_DIR=$SF01 sbt -batch "runMain graft.Bench"
echo "[refresh] sf0.1 isolated (fresh JVM per headliner)"
SPARK_GRAFT_SF_DIR=$SF01 sbt -batch "runMain graft.BenchIsolated"
echo "[refresh] sf0.1 in-suite at local[8] (second-parallelism record:"
echo "          same full registry + canary protocol, 8 cores/partitions)"
SPARK_GRAFT_SF_DIR=$SF01 SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL8.json \
  sbt -batch "runMain graft.Bench"

echo "[refresh] PERFTABLE.md (LAST — the table is generated from what was"
echo "          just recorded, never from stale records)"
python3 scripts/perftable.py "$ROUND"
echo "[refresh] done — commit BENCH*.json + PERFTABLE.md atomically"

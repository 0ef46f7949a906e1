#!/usr/bin/env bash
# LEAKCHECK generator: greps the shippable surface (src/, build.sbt,
# scripts/, project/) for proprietary/internal references across the same
# seven categories the per-round record reports, and writes LEAKCHECK.json
# stamped with the scan time, HEAD SHA, and tool versions — so each
# round's record is provably a fresh scan, not a hand-bumped round number
# (round-13 advice: the only diff between r12 and r13 records was the
# editable `round` field).
#
# Usage: scripts/leakcheck.sh <round>
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND=${1:?usage: scripts/leakcheck.sh <round>}
# the round number is interpolated into JSON — a non-numeric argument
# would emit an invalid record that still exits 0 (round-14 advice)
[[ "$ROUND" =~ ^[0-9]+$ ]] || { echo "round must be an integer, got: $ROUND" >&2; exit 2; }

SCOPE=(src build.sbt scripts project/build.properties project/plugins.sbt README.md SURVEY.md)
SCOPE=($(for p in "${SCOPE[@]}"; do [ -e "$p" ] && echo "$p"; done))

scan() { # scan <pattern> -> newline-separated "file:line:match" hits
  # the scanner itself necessarily contains every pattern it greps for
  grep -rinE --exclude=leakcheck.sh "$1" "${SCOPE[@]}" 2>/dev/null || true
}

emit_hits() { # emit_hits <category> <pattern>
  local hits
  hits=$(scan "$2")
  local n=0
  local json="[]"
  if [ -n "$hits" ]; then
    n=$(printf '%s\n' "$hits" | wc -l)
    json=$(printf '%s\n' "$hits" | python3 -c \
      'import json,sys; print(json.dumps([l.rstrip("\n") for l in sys.stdin]))')
  fi
  TOTAL=$((TOTAL + n))
  printf '    "%s": %s' "$1" "$json"
}

TOTAL=0
{
  echo '{'
  echo "  \"round\": $ROUND,"
  echo "  \"scanned_at\": \"$(date -u +%Y-%m-%dT%H:%M:%SZ)\","
  echo "  \"head_sha\": \"$(git rev-parse HEAD)\","
  # exclude this script's own output: rewriting LEAKCHECK.json is what a
  # scan DOES, so counting it as dirt made every post-commit re-scan claim
  # a dirty tree (round-15 nit)
  echo "  \"tree_dirty\": $(if git diff --quiet -- . ':(exclude)LEAKCHECK.json' && git diff --cached --quiet -- . ':(exclude)LEAKCHECK.json'; then echo false; else echo true; fi),"
  echo "  \"grep_version\": \"$(grep --version | head -1)\","
  echo '  "hits": {'
  emit_hits "internal-import" 'import (anthropic|claude)' ; echo ','
  emit_hits "internal-url"    '\bgo/[a-z-]+|anthropic\.com/internal|\.ant\.dev' ; echo ','
  emit_hits "internal-pkg2"   'claude[-_]?(cli|code)[-_]?internal|com\.anthropic' ; echo ','
  emit_hits "internal-bucket" '(s3|gs)://[a-z0-9-]*(anthropic|claude|internal)' ; echo ','
  emit_hits "slack-link"      'slack\.com/archives|#claude-code' ; echo ','
  emit_hits "api-key"         'sk-ant-|hf_[A-Za-z0-9]{16}|api[-_]key *= *"[A-Za-z0-9]' ; echo ','
  emit_hits "axon-env"        'ANTHROPIC_[A-Z_]+|CLAUDE_[A-Z_]+' ; echo ''
  echo '  },'
  echo "  \"n_hits\": $TOTAL"
  echo '}'
} > LEAKCHECK.json
echo "[leakcheck] round $ROUND: $TOTAL hits -> LEAKCHECK.json (HEAD $(git rev-parse --short HEAD))"
test "$TOTAL" -eq 0

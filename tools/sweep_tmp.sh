#!/usr/bin/env bash
# Round-end /tmp scratch sweep (VERDICT r13 nit 2: the sweep must be a
# tool, not a manual step). Two classes of scratch dir:
#   1. graft_<tag>_<hash>_<pid>  — ExtQueries.scratchDir; removable the
#      moment the owning pid is dead.
#   2. <prefix><random digits>   — Files.createTempDirectory in specs
#      and bench tools; no pid in the name, so only remove when older
#      than AGE_MIN minutes (default 60 — longer than any single sbt
#      test or bench run holds one).
# Prefixes for class 2 are greg'd from the source at run time so new
# temp dirs are swept without editing this script.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
AGE_MIN="${1:-60}"

# class 1: graft_* with a dead pid suffix
for d in /tmp/graft_*; do
  [ -e "$d" ] || continue
  pid="${d##*_}"
  if [[ "$pid" =~ ^[0-9]+$ ]] && ! kill -0 "$pid" 2>/dev/null; then
    rm -rf -- "$d"
    echo "swept (dead pid $pid): $d"
  fi
done

# class 2: createTempDirectory prefixes, age-gated
prefixes=$(grep -rho 'createTempDirectory("[^"]*"' "$REPO/src" \
  | sed 's/createTempDirectory("//; s/"//' | sort -u)
for p in $prefixes; do
  # exact prefix + digits only — never glob into unrelated dirs
  find /tmp -maxdepth 1 -name "${p}[0-9]*" -mmin "+${AGE_MIN}" \
    -regextype posix-extended -regex "/tmp/${p}[0-9]+" \
    -exec rm -rf -- {} + -exec echo "swept (age>${AGE_MIN}m): {}" \; \
    2>/dev/null || true
done
echo "sweep done"

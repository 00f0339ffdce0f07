#!/bin/bash
# Round-5 seventh-wave TPU queue: closing measurements.
#   gn_b2   : GN B=2 bf16 10-step train confirmation (the recommended
#             large-batch posture now that the BN miscompile is pinned)
#   ablate  : in-situ component marginals at the SHIPPED defaults
#             (bilinear + moments + auto-64 bands) — refreshes the r4
#             attribution record (VERDICT r4 #2 fetch-marginal criterion)
set -u
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5g.pid
trap 'rm -f /tmp/r5g.pid' EXIT
OUT=${OUT:-/tmp/r5g}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0
KNOWN="gn_b2 ablate"
for a in "$@"; do
  case " $KNOWN " in
    *" $a "*) ;;
    *) echo "unknown step '$a' (known: $KNOWN)" >&2; exit 2 ;;
  esac
done
ARGS="$*"
pick() { [ -z "$ARGS" ] || [[ " $ARGS " == *" $1 "* ]]; }
run() {
  local name=$1 tmo=$2; shift 2
  [ -e "$OUT/$name.done" ] && { log "SKIP  $name (done marker)"; return; }
  log "START $name"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && FAILS=$((FAILS+1)) || touch "$OUT/$name.done"
  log "END   $name exit=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}
pick gn_b2 && run gn_b2 2400 \
    python -u debug/nan_bisect.py --steps 10 --height 128 --width 192 \
    --norm gn
pick ablate && run ablate 5400 \
    python -u benchmarks/flow3_ablate.py full nofetch noedge noknn nowmax \
    nohead nopyr noref
log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

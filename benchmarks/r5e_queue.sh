#!/bin/bash
# Round-5 fifth-wave TPU queue (runs after r5d_queue.sh drains).
#
# Steps:
#   nan_frozen : EdgeConv train BN with FROZEN running stats (no batch
#                moments, no batch_stats mutation) — the last single-seam
#                cut after 2pass/barrier/sgstats all NAN'd. CLEAN here
#                indicts the moment-reduction/variable-update machinery;
#                NAN here indicts the surrounding fused region wholesale
#                (compiler-bug posture: document, keep B=1/GN mitigations)
#   nan_full   : full-size B=2 10-step confirmation on the SHIPPED code —
#                create /tmp/r5e/nan_full.done to skip if no fix shipped
set -u
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5e.pid
trap 'rm -f /tmp/r5e.pid' EXIT
OUT=${OUT:-/tmp/r5e}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0
KNOWN="nan_frozen nan_full"
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
pick nan_frozen && run nan_frozen 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_frozen
pick nan_full && run nan_full 5400 \
    python -u debug/nan_bisect.py --steps 10 --batch 2
log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

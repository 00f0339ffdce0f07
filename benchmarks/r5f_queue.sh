#!/bin/bash
# Round-5 sixth-wave TPU queue: final NaN-mechanism split.
# r5e verdict chain so far: 2pass/barrier/sgstats NAN, frozen CLEAN —
# the trigger is in the (gradient-free!) moment-reduction + running-stat
# update machinery => XLA TPU miscompile. These two seams name the half:
#   nan_noupdate : moments computed + normalize, NO batch_stats mutation
#   nan_flat     : moments via flattened (B*N*K, F) reduce (same update)
set -u
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5f.pid
trap 'rm -f /tmp/r5f.pid' EXIT
OUT=${OUT:-/tmp/r5f}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0
KNOWN="nan_noupdate nan_flat nan_full"
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
pick nan_noupdate && run nan_noupdate 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_noupdate
pick nan_flat && run nan_flat 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_flat
# only meaningful once a fix ships in edge_conv.py (create the skip
# marker /tmp/r5f/nan_full.done otherwise)
pick nan_full && run nan_full 5400 \
    python -u debug/nan_bisect.py --steps 10 --batch 2
log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

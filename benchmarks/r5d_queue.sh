#!/bin/bash
# Round-5 fourth-wave TPU queue (runs after r5c_queue.sh drains).
#
# Steps:
#   pgather2   : mechanism probe post same-shape-gather rewrite — does
#                Mosaic lower the in-kernel take_along_axis, and at what
#                rate vs the XLA row gather?
#   knobs3     : full-pipeline bilinear_p vs base A/B at the shipped
#                defaults (decides whether the Pallas fetch ships)
#   bench_ship : plain bench.py — final in-session headline at shipped
#                defaults with the warmup-robust measure (the number the
#                driver's BENCH_r05 should reproduce)
set -u
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5d.pid
trap 'rm -f /tmp/r5d.pid' EXIT
OUT=${OUT:-/tmp/r5d}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0

KNOWN="pgather2 knobs3 bench_ship nan_full"
for a in "$@"; do
  case " $KNOWN " in
    *" $a "*) ;;
    *) echo "unknown step '$a' (known: $KNOWN)" >&2; exit 2 ;;
  esac
done
ARGS="$*"
pick() { [ -z "$ARGS" ] || [[ " $ARGS " == *" $1 "* ]]; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$OUT/$name.done" ] && { log "SKIP  $name (done marker)"; return; }
  log "START $name"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && FAILS=$((FAILS+1)) || touch "$OUT/$name.done"
  log "END   $name exit=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

pick pgather2 && run pgather2 1500 python -u benchmarks/pallas_gather_probe.py
pick knobs3 && run knobs3 3600 python -u benchmarks/r5_knob_ab.py pallas base
pick bench_ship && run bench_ship 3600 python -u bench.py
# VERDICT r4 #3's done-criterion: B=2 bf16+BN trains >=10 on-chip steps
# with zero skips, at FULL size, on the SHIPPED code (the winning BN-seam
# fix is promoted into edge_conv.py before this step runs)
pick nan_full && run nan_full 5400 \
    python -u debug/nan_bisect.py --steps 10 --batch 2

log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

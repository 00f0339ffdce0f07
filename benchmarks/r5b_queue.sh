#!/bin/bash
# Round-5 combined TPU queue (second wave, after the fetch A/B and the
# first nan_hunt wave were interrupted by session end).
#
# Steps (each bounded; pass names to run a subset; done-marker files let a
# re-run after a crash skip finished work):
#   pgather    : Pallas windowed-gather mechanism probe (take vs loop vs
#                onehot vs XLA baseline) at flow3-like shapes
#   base_leaf  : nan_bisect base repro at 128x192 with the NEW per-leaf
#                reporter (names the exact BAD parameters)
#   bn_coarse  : nan_bisect --ablate bn_free_coarse (control: flow keeps
#                BN -> expected NAN if the flow-BN story is right)
#   dbg_nans   : jax_debug_nans op-level hunt (de-optimized rerun names the
#                primitive; needs the long timeout)
#   knobs      : r5_knob_ab.py — chunk-rows / moments / bilinear_p A/B at
#                the shipped eval default config
#   train      : train-step fetch A/B incl. bilinear backward
#   tt         : 1280x1024 T&T-shape number at the shipped default
#   details    : BENCH_DETAILS=1 bench.py (roofline + stage latencies)
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-/tmp/r5b}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0

KNOWN="pgather base_leaf bn_coarse dbg_nans knobs train tt details"
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

# order: default-deciding A/B first, then the NaN hunt, then the rest
pick pgather && run pgather 1500 python -u benchmarks/pallas_gather_probe.py
pick knobs && run knobs 4800 python -u benchmarks/r5_knob_ab.py
pick base_leaf && run base_leaf 1500 \
    python -u debug/nan_bisect.py --steps 1 --height 128 --width 192
pick bn_coarse && run bn_coarse 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate bn_free_coarse
pick dbg_nans && run dbg_nans 3600 \
    python -u debug/nan_bisect.py --steps 2 --height 128 --width 192 \
    --debug_nans
pick train && run train 3600 \
    python -u benchmarks/train_fetch_bench.py table bilinear table+feat \
    bilinear+feat
pick tt && run tt 2400 python -u benchmarks/tt_sweep.py
pick details && run details 5400 env BENCH_DETAILS=1 python -u bench.py

log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

#!/bin/bash
# Round-5 third-wave TPU queue (runs after r5b_queue.sh drains).
#
# Steps (bounded; pass names for a subset; done-markers skip finished work):
#   nan_edge : nan_bisect --ablate bn_free_edge  (EdgeConv norm=none, flow
#              head keeps BN) — splits bn_free_flow's CLEAN between the two
#              flow-side BN implementations
#   nan_head : nan_bisect --ablate bn_free_head  (flow-head SharedMLP
#              norm=none, EdgeConv keeps BN) — the complementary cut
#   knobs2   : r5_knob_ab.py wave 2 at the NEW shipped defaults (bilinear +
#              moments auto): base / stacked re-check / chunk64-on-moments /
#              bilinear_p (post-lowering-fix Pallas windowed gather) / base
#   nan_f32  : base repro at MODEL.DTYPE=float32 — confirms the NaN is
#              bf16-specific at the small repro shape (completes the story
#              table; full-size f32 was clean in earlier rounds)
#   nan_2pass / nan_barrier / nan_sgstats : mechanism seams inside
#              EdgeConv's train BN (see models/edge_conv.py module flags)
set -u
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5c.pid
trap 'rm -f /tmp/r5c.pid' EXIT
OUT=${OUT:-/tmp/r5c}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0

KNOWN="nan_edge nan_head nan_f32 knobs2 train2 tt2 nan_2pass nan_barrier nan_sgstats"
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

pick nan_edge && run nan_edge 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate bn_free_edge
pick nan_head && run nan_head 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate bn_free_head
pick knobs2 && run knobs2 4800 python -u benchmarks/r5_knob_ab.py
# the r5b train step's +feat/+mom variants never ran (the in-flight bash
# re-read a stale script view); results merge into train_ab_r5.json
pick train2 && run train2 3600 \
    python -u benchmarks/train_fetch_bench.py table+feat bilinear+feat \
    bilinear+mom bilinear+feat+mom
# catch-up for a timed-out r5b tt step (tt_sweep resumes: measured tokens
# are skipped, results merge into tt_sweep_r5.json)
pick tt2 && run tt2 3600 python -u benchmarks/tt_sweep.py
pick nan_f32 && run nan_f32 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --dtype float32
# mechanism seams inside EdgeConv's train BN (models/edge_conv.py flags);
# whichever comes back CLEAN names the mechanism and becomes the fix
pick nan_2pass && run nan_2pass 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_2pass
pick nan_barrier && run nan_barrier 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_barrier
pick nan_sgstats && run nan_sgstats 1800 \
    python -u debug/nan_bisect.py --steps 4 --height 128 --width 192 \
    --ablate edge_bn_sgstats

log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

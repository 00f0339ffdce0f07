#!/bin/bash
# Round-4 third-wave queue: land the outstanding VERDICT-r3 artifacts in
# one TPU window, in judge-priority order:
#   nan    — the B>=2 bf16+BN backward-NaN bisect (VERDICT r3 #3; six
#            bounded steps: base repro, three ablation axes, HLO dump)
#   bench  — full headline + BENCH_DETAILS (stages, V3_D48, batch2,
#            train_step w/ breakdown) at the round-4 defaults
#            (FLOW_FETCH=auto -> bilinear at eval)   (VERDICT r3 #2/#7)
#   train  — train-step A/B table vs bilinear flow fetch (VERDICT r3 #5)
#   tt     — 1280x1024 scaling re-measure on the promoted bilinear engine
#            (VERDICT r3 #2's post-fix number; the 2026-08-19 5.997 s/map
#            was measured before the bilinear promotion)
# Logs land in $OUT (default /tmp/tpuq_r4c). Steps independent/idempotent.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-/tmp/tpuq_r4c}
mkdir -p "$OUT"

# validate step-name args up front (ADVICE r4: a typo used to run zero
# steps and still log QUEUE DONE, silently wasting a TPU window)
KNOWN="nan bench train tt"
for a in "$@"; do
  case " $KNOWN " in
    *" $a "*) ;;
    *) echo "unknown step '$a' (known: $KNOWN)" >&2; exit 2 ;;
  esac
done

FAILS=0
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2 rc; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; rc=$?
  [ "$rc" -ne 0 ] && FAILS=$((FAILS + 1))
  log "END   $name exit=$rc (tail: $(tail -1 "$OUT/$name.log" 2>/dev/null | cut -c1-200))"
}

want() { [ $# -eq 0 ] && return 0; for s in "$@"; do [ "$s" = "$STEP" ] && return 0; done; return 1; }

STEP=nan; if want "$@"; then
  run nan_base   1600 python debug/nan_bisect.py --steps 6
  run nan_bnfree 1600 python debug/nan_bisect.py --ablate bn_free_flow
  run nan_f32var 1600 python debug/nan_bisect.py --ablate f32_var
  run nan_sgsoft 1600 python debug/nan_bisect.py --ablate sg_softmax_in
  run nan_sgedge 1600 python debug/nan_bisect.py --ablate sg_edge_in
  run nan_hlo    1600 python debug/nan_bisect.py --steps 2 --dump_hlo "$OUT/nan_step.hlo"
fi
STEP=bench; want "$@" && run bench       3000 env BENCH_DETAILS=1 python bench.py
STEP=train; want "$@" && run train_ab    1800 python benchmarks/train_fetch_bench.py table bilinear
STEP=tt;    want "$@" && run tt_sweep    1800 python benchmarks/tt_sweep.py
log "QUEUE DONE ($FAILS step(s) failed)"
[ "$FAILS" -eq 0 ] || exit 1

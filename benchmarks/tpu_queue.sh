#!/bin/bash
# One-shot measurement queue for a fresh TPU window (docs/STATUS.md round-3
# protocol). Runs every pending on-chip measurement in priority order, each
# step bounded by `timeout`; logs land in $OUT (default /tmp/tpuq). Safe to
# re-run: steps are independent and idempotent (bench.py rewrites its
# artifacts; ablation/bisect scripts only print).
#
#   bash benchmarks/tpu_queue.sh            # full queue
#   OUT=/tmp/tpuq2 bash benchmarks/tpu_queue.sh bench flow3   # named steps
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpuq}
mkdir -p "$OUT"

log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  log "END   $name exit=$? (tail: $(tail -1 "$OUT/$name.log" 2>/dev/null | cut -c1-160))"
}

want() { [ $# -eq 0 ] && return 0; for s in "$@"; do [ "$s" = "$STEP" ] && return 0; done; return 1; }

STEP=bench;   want "$@" && run bench        4200 env BENCH_DETAILS=1 python bench.py
STEP=flow3;   want "$@" && run flow3_ablate 2400 python benchmarks/flow3_ablate.py
STEP=tt;      want "$@" && run tt_sweep     2400 python benchmarks/tt_sweep.py
STEP=train;   want "$@" && run train_fetch  1800 python benchmarks/train_fetch_bench.py
STEP=nan;     if want "$@"; then
  run nan_base    900 python debug/nan_bisect.py --steps 6
  run nan_bnfree  900 python debug/nan_bisect.py --ablate bn_free_flow
  run nan_f32var  900 python debug/nan_bisect.py --ablate f32_var
  run nan_sgsoft  900 python debug/nan_bisect.py --ablate sg_softmax_in
  run nan_sgedge  900 python debug/nan_bisect.py --ablate sg_edge_in
  run nan_hlo     900 python debug/nan_bisect.py --steps 2 --dump_hlo "$OUT/nan_step.hlo"
fi
log "QUEUE DONE"

#!/bin/bash
# Round-4 second-wave measurement queue: the composition-fix candidates
# (weighted tap extraction, bf16 source features) and the depth-grouped
# coarse sweep, standalone and in-core, then a headline A/B of the best
# combination. Logs land in $OUT (default /tmp/tpuq_r4v).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpuq_r4v}
mkdir -p "$OUT"

log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  log "END   $name exit=$? (tail: $(tail -1 "$OUT/$name.log" 2>/dev/null | cut -c1-200))"
}

want() { [ $# -eq 0 ] && return 0; for s in "$@"; do [ "$s" = "$STEP" ] && return 0; done; return 1; }

STEP=band;   want "$@" && run band_probe  3000 python benchmarks/band_probe.py \
  full fastmode fast_btab fast_bboth fast_weighted fast_weighted_bf16 fast_take_weighted
STEP=sweep;  want "$@" && run sweep_probe 1200 python benchmarks/sweep_probe.py
STEP=head;   if want "$@"; then
  # headline A/B of the combined candidates (bench headline only, no
  # details phase — fast compare in maps/s currency; each headline run
  # pays ~5 min model init through the tunnel, so probe-level losers are
  # not re-measured here)
  run head_combo 1800 env BENCH_EXTRACT=weighted BENCH_SRC_DTYPE=bfloat16 python bench.py
fi
log "QUEUE DONE"

#!/bin/bash
# NaN-bisect driver (VERDICT r4 #3, third round on the list).
#
# Phase 1 (2026-08-20, committed in /tmp/nan_hunt + docs/STATUS.md): the
# B=2 bf16+BN backward NaN REPRODUCES at 128x192 (6-min compile) with
# vol_conv grads 100% non-finite at step 0 and point_flow only ~2% bad —
# so this driver now runs the ablation axes directly at 128x192. The
# informative split is sg_flow_depth: if cutting the flow->coarse_depth
# cotangent cleans vol_conv, the origin is flow-side (then bn_free_flow /
# sg_softmax_in / sg_edge_in / f32_var localize it); if not, it is inside
# the volume U-Net backward (then bn_free_coarse / f32_vol / sg_cost).
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-/tmp/nan_hunt}
H=${H:-128}; W=${W:-192}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/hunt.log"; }
FAILS=0

run() { # run <name> <timeout_s> <args...>
  local name=$1 tmo=$2; shift 2
  [ -s "$OUT/$name.log" ] && grep -qE "NONFINITE|CLEAN" "$OUT/$name.log" && {
    log "SKIP  $name (already has a verdict)"; return; }
  log "START $name: nan_bisect $*"
  timeout "$tmo" python -u debug/nan_bisect.py "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  local verdict="?"
  grep -q "NONFINITE" "$OUT/$name.log" && verdict=NAN
  grep -q "CLEAN" "$OUT/$name.log" && verdict=CLEAN
  [ $rc -eq 124 ] && verdict=TIMEOUT
  [ $rc -ne 0 ] && [ "$verdict" = "?" ] && { verdict=ERROR; FAILS=$((FAILS+1)); }
  log "END   $name exit=$rc verdict=$verdict"
}

for ab in sg_flow_depth bn_free_flow sg_softmax_in sg_edge_in f32_var \
          bn_free_coarse f32_vol sg_cost; do
  run "ab_$ab" 1500 --steps 4 --height "$H" --width "$W" --ablate "$ab"
done
# op-level hunt last: jax_debug_nans re-runs op-by-op on the first NaN and
# names the primitive (crashes informatively)
run debug_nans 1800 --steps 4 --height "$H" --width "$W" --debug_nans
log "HUNT DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

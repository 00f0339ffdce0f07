#!/bin/bash
# Round-5 TPU measurement queue (run after debug/nan_hunt.sh frees the chip).
#
# Steps (each bounded; pass names to run a subset):
#   ablate : flow3 stub-ablation at the SHIPPED default (FLOW_FETCH=bilinear)
#            -- the r4 attribution was taken at the excised grouped config
#   knobs  : chunk-rows / moments A/B at bilinear (r5_knob_ab.py)
#   train  : train-step fetch A/B incl. bilinear backward (VERDICT r4 #5)
#   tt     : 1280x1024 T&T-shape number at the shipped default (VERDICT r4 #4)
#   details: BENCH_DETAILS=1 bench.py -- refresh the artifact (roofline row,
#            bilinear-default stage latencies, train step)
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-/tmp/r5_queue}
mkdir -p "$OUT"
log() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$OUT/queue.log"; }
FAILS=0

KNOWN="ablate knobs train tt details"
for a in "$@"; do
  case " $KNOWN " in
    *" $a "*) ;;
    *) echo "unknown step '$a' (known: $KNOWN)" >&2; exit 2 ;;
  esac
done
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && FAILS=$((FAILS+1))
  log "END   $name exit=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

ARGS="$*"
pick() { [ -z "$ARGS" ] || [[ " $ARGS " == *" $1 "* ]]; }

pick ablate && run ablate 3000 env BENCH_FETCH=bilinear \
    python -u benchmarks/flow3_ablate.py full nofetch noedge noknn nohead
pick knobs && run knobs 3600 python -u benchmarks/r5_knob_ab.py
pick train && run train 3000 python -u benchmarks/train_fetch_bench.py table bilinear
pick tt && run tt 2400 python -u benchmarks/tt_sweep.py
pick details && run details 5400 env BENCH_DETAILS=1 python -u bench.py

log "QUEUE DONE fails=$FAILS"
exit $([ $FAILS -eq 0 ]; echo $?)

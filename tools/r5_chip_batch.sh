#!/bin/bash
# Round-5 chip measurement batch (VERDICT r4 next#3/5/7): re-pin every
# standing perf conclusion to current code and measure the r5 additions.
# Run when the axon tunnel is up:  bash tools/r5_chip_batch.sh
#
# Steps:
#   1. NMS XLA vs Pallas vs floor        -> NMS_PROBE.json     (re-pin)
#   2. proposal-matching floor           -> MATCH_PROBE.json   (re-pin)
#   3. int8 per-shape gate + end-to-end  -> INT8_PROBE.json,
#                                           QUANT_E2E.jsonl    (re-pin)
#   4. rotated-preprocess decomposition incl. 2level stages
#                                        -> ROT_TIME_PROBE.json
#   5. 2level warp cost attribution      -> ROT2LEVEL_DECOMP.json
#   6. BN-fold serving A/B               -> FOLD_BN_PROBE.json
#   7. train rooflines (fused head, rotation 2pass vs 2level, batch
#      8/128, 30-iter-equivalent horizons via --chain)
#                                        -> ROOFLINE_train_r5.json etc.
#   8. headline bench (resilient supervisor) -> bench_r5.log
cd "$(dirname "$0")/.." || exit 1
OUT=.
log() { echo "[r5-batch $(date +%H:%M:%S)] $*"; }

run_step() {
  local name="$1" tmo="$2" out="$3"; shift 3
  local a rc
  for a in 1 2 3; do
    timeout "$tmo" "$@" >"$out" 2>"$out.err"
    rc=$?
    cat "$out"; sed 's/^/  [stderr] /' "$out.err" | tail -20
    if [ "$rc" -eq 0 ]; then log "$name ok (attempt $a)"; return 0; fi
    log "$name failed rc=$rc (attempt $a/3)"
    [ "$a" -lt 3 ] && sleep 120
  done
  log "$name FAILED after 3 attempts"
  return 1
}

log "1/8 NMS probe"
run_step nms_probe 1500 /tmp/nms_probe_r5.out python tools/nms_probe.py --write

log "2/8 match probe"
run_step match_probe 1500 /tmp/match_probe_r5.out python tools/match_probe.py --write

log "3/8 int8 gate + end-to-end"
run_step int8_probe 2000 "$OUT/INT8_PROBE.jsonl" python tools/int8_probe.py \
  && python - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1] + "/INT8_PROBE.jsonl") if l.strip()]
json.dump({"rows": rows}, open(sys.argv[1] + "/INT8_PROBE.json", "w"), indent=1)
EOF
run_step quant_e2e 2400 "$OUT/QUANT_E2E.jsonl" python tools/quant_experiment.py

log "4/8 rotated preprocess decomposition (2pass + 2level + blocks)"
run_step rot_time 2800 /tmp/rot_time_r5.out python tools/rot_time_probe.py \
  --stages warp128 pre128 prenorot128 pre128_2level pre128_2level_b8 \
  warp128_2level --iters 5 --trials 2

log "5/8 2level cost attribution"
run_step rot2level_decomp 2000 /tmp/rot2l_decomp.out \
  python tools/rot2level_decomp_probe.py

log "6/8 BN-fold serving A/B"
run_step fold_bn 1500 /tmp/fold_bn_r5.out python tools/fold_bn_probe.py

log "7/8 train rooflines"
run_step train_roofline 2800 /tmp/roofline_train_r5.out \
  python tools/roofline.py --mode train_fused --batches 8 128 \
  --json ROOFLINE_train_r5.json
run_step train_rot_2pass 2000 /tmp/roofline_rot2pass_r5.out \
  python tools/roofline.py --mode train_rot --rotate-impl 2pass \
  --batches 128 --iters 5 --chain 6 --json ROOFLINE_train_rot.json
run_step train_rot_2level 2400 /tmp/roofline_rot2level_r5.out \
  python tools/roofline.py --mode train_rot --rotate-impl 2level \
  --batches 8 128 --iters 5 --chain 6 --json ROOFLINE_train_rot_2level.json

log "8/8 headline bench"
timeout 4000 python bench.py >"$OUT/bench_r5.log" 2>/tmp/bench_r5.err
rc=$?
cat "$OUT/bench_r5.log"
if [ "$rc" -ne 0 ]; then
  log "bench rc=$rc; one retry after 180s"; sleep 180
  timeout 4000 python bench.py >"$OUT/bench_r5.log" 2>>/tmp/bench_r5.err
  rc=$?
  cat "$OUT/bench_r5.log"
fi
[ "$rc" -ne 0 ] && log "bench FAILED rc=$rc"

log "done"

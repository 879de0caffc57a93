#!/bin/bash
# Round-4 chip measurement batch (VERDICT r3 next#1/2/3/4/6): run when
# the axon tunnel is up.  Each step is independently timeboxed, retried
# (the tunnel both errors and hangs transiently — CLAUDE.md), and
# logged; artifacts land at the repo root for ROOFLINE.md/the judge.
#
#   bash tools/r4_chip_batch.sh
#
# Steps:
#   1. int8 gate probe           -> INT8_PROBE.json        (next#2)
#   2. fused_stem_hm decompose   -> STEM_HM_PROBE.json     (next#3)
#   3. NMS XLA vs Pallas vs floor-> NMS_PROBE.json         (next#6)
#   4. training roofline fused-head on/off at batch 8/128
#                                -> ROOFLINE_train_r4.json,
#                                   ROOFLINE_train_fused.json (next#4)
#   5. headline bench (resilient supervisor) -> bench_r4.log (next#1)
cd "$(dirname "$0")/.." || exit 1
# all artifacts land at the repo root (where the judge and ROOFLINE.md look)
OUT=.
log() { echo "[r4-batch $(date +%H:%M:%S)] $*"; }

# run_step NAME TIMEOUT STDOUT_FILE CMD...
# Retries up to 3 attempts (sleep 120 between) so one transient tunnel
# drop mid-probe doesn't erase the step's artifact.  Stdout goes to
# STDOUT_FILE only (probes emit pure JSON lines there; the converters
# below json.loads every line), stderr to STDOUT_FILE.err, both echoed.
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

log "1/5 int8 probe"
run_step int8_probe 2000 "$OUT/INT8_PROBE.jsonl" python tools/int8_probe.py \
  && python - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1] + "/INT8_PROBE.jsonl") if l.strip()]
json.dump({"rows": rows}, open(sys.argv[1] + "/INT8_PROBE.json", "w"), indent=1)
EOF

log "1b/5 int8 end-to-end serving program vs bf16"
run_step quant_e2e 2400 "$OUT/QUANT_E2E.jsonl" python tools/quant_experiment.py

log "2/5 fused_stem_hm decomposition"
run_step stem_hm 2000 "$OUT/STEM_HM_PROBE.jsonl" python tools/stem_hm_experiment.py \
  && python - "$OUT" <<'EOF'
import json, sys
lines = [json.loads(l) for l in open(sys.argv[1] + "/STEM_HM_PROBE.jsonl") if l.strip()]
json.dump(lines[-1] if lines else {}, open(sys.argv[1] + "/STEM_HM_PROBE.json", "w"), indent=1)
EOF

log "3/5 NMS probe"
run_step nms_probe 1500 /tmp/nms_probe.out python tools/nms_probe.py --write

log "4/5 training roofline, fused head off/on + rotation cost"
run_step train_roofline 2800 /tmp/roofline_train.out \
  python tools/roofline.py --mode train --batches 8 128 --json ROOFLINE_train_r4.json
run_step train_fused_roofline 2800 /tmp/roofline_train_fused.out \
  python tools/roofline.py --mode train_fused --batches 8 128 --json ROOFLINE_train_fused.json
run_step train_rot_roofline 2000 /tmp/roofline_train_rot.out \
  python tools/roofline.py --mode train_rot --batches 128 --json ROOFLINE_train_rot.json

log "5/5 headline bench"
# bench.py has its own parent-supervisor retries/deadline; redirect to
# the log (NOT a tee pipeline — $? must be bench's rc, not tee's) and
# give the whole supervisor one extra attempt.
timeout 4000 python bench.py >"$OUT/bench_r4.log" 2>/tmp/bench_r4.err
rc=$?
cat "$OUT/bench_r4.log"
if [ "$rc" -ne 0 ]; then
  log "bench rc=$rc; one retry after 180s"; sleep 180
  timeout 4000 python bench.py >"$OUT/bench_r4.log" 2>>/tmp/bench_r4.err
  rc=$?
  cat "$OUT/bench_r4.log"
fi
[ "$rc" -ne 0 ] && log "bench FAILED rc=$rc"

log "done"

#!/bin/bash
# Round-3 continuation queue (priority order for a flaky tunnel):
#  1. blockdiag micro A/B at teacher shapes
#  2. joint: colcat vs blockdiag E2E, interleaved
#  3. joint: true-N off/on interleaved re-check
#  4. joint batch sweep with winner config
#  5. stage-1 image true-N re-check
cd /root/repo
set -u
run() {  # run <label> <env_kv...> -- <stage> <batch> [extra...]
  local label=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local stage=$1 batch=$2; shift 2
  local ct=--cached-teacher
  [ "$stage" = image ] && ct=
  env "${envs[@]}" timeout 1800 python bench.py --stage "$stage" --batch "$batch" $ct --steps 20 "$@" > ".bench/out_${label}.json" 2> ".bench/err_${label}.log"
  python - "$label" <<'PY'
import json, sys
try:
    d = json.load(open(f".bench/out_{sys.argv[1]}.json"))
    det = d.get("detail", {})
    print(f"=== {sys.argv[1]}: {d['value']} {d['unit']} step={det.get('step_time_ms')}ms")
except Exception as e:
    print(f"=== {sys.argv[1]}: ERROR {e}")
PY
}
echo "--- stage 1: micro"
timeout 3600 python .bench/micro_plain_attn.py 2> .bench/err_micro.log | tee .bench/out_micro.txt
echo "--- stage 2: joint colcat vs blockdiag (interleaved)"
run j256_cc_1 DISTILLCLIP_PLAIN_ATTN=colcat    -- l_clip 256
run j256_bd_1 DISTILLCLIP_PLAIN_ATTN=blockdiag -- l_clip 256
run j256_cc_2 DISTILLCLIP_PLAIN_ATTN=colcat    -- l_clip 256
run j256_bd_2 DISTILLCLIP_PLAIN_ATTN=blockdiag -- l_clip 256
echo "--- stage 3: true-N off/on (interleaved, blockdiag on)"
run j256_tn0_1 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=0 -- l_clip 256
run j256_tn1_1 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=1 -- l_clip 256
run j256_tn0_2 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=0 -- l_clip 256
run j256_tn1_2 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=1 -- l_clip 256
echo "--- stage 4: joint batch sweep (blockdiag)"
run j320_bd DISTILLCLIP_PLAIN_ATTN=blockdiag -- l_clip 320
run j384_bd DISTILLCLIP_PLAIN_ATTN=blockdiag -- l_clip 384
echo "--- stage 5: image true-N re-check"
run i256_tn0 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=0 -- image 256
run i256_tn1 DISTILLCLIP_PLAIN_ATTN=blockdiag DISTILLCLIP_TRUE_N=1 -- image 256
echo "--- stage 6: text with blockdiag (text teacher cached; expect ~neutral)"
run t1024_cc DISTILLCLIP_PLAIN_ATTN=colcat    -- text 1024
run t1024_bd DISTILLCLIP_PLAIN_ATTN=blockdiag -- text 1024
echo "--- stage 7: fresh joint trace (winner config) + final headline"
env DISTILLCLIP_PLAIN_ATTN=blockdiag timeout 1800 python bench.py --stage l_clip --batch 256 --cached-teacher --steps 20 --trace .bench/trace_joint_r3b > .bench/out_trace.json 2> .bench/err_trace.log
echo trace done
echo DONE_ALL

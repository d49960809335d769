#!/bin/sh
# Elementwise-bucket ablations (README §device profile: 17 ms/step, 38% of
# device time, in elementwise/reduce fusions). Each knob is non-parity —
# these runs attribute VPU/fp32 cost, they are not production configs.
# Run serially on an idle TPU; compare `value` against the same-day baseline.
set -e
out="${1:-/tmp/bench_ablations}"
mkdir -p "$out"
echo "== baseline =="
python bench.py | tee "$out/baseline.json"
echo "== gelu tanh =="
MDVIT_GELU=tanh python bench.py | tee "$out/gelu_tanh.json"
echo "== ln native =="
MDVIT_LN_NATIVE=1 python bench.py | tee "$out/ln_native.json"
echo "== softmax native =="
MDVIT_SOFTMAX_NATIVE=1 python bench.py | tee "$out/softmax_native.json"
echo "== all three =="
MDVIT_GELU=tanh MDVIT_LN_NATIVE=1 MDVIT_SOFTMAX_NATIVE=1 \
    python bench.py | tee "$out/all.json"

#!/bin/sh
# Elementwise-bucket ablations (README §device profile: 17 ms/step, 38% of
# device time, in elementwise/reduce fusions). Round-4 results (img/s):
# erf 344.3, tanh 366.7/362.2, ln_native 343.3 (free), softmax_native 346.1,
# all three 363.7 — the attributable bucket was the GELU, which production
# now recovers parity-safely via fast_gelu (MDVIT_GELU=auto default).
# The legs pin MDVIT_GELU explicitly so the sweep stays meaningful under
# the auto default; ln/softmax knobs are non-parity, attribution only.
# Run serially on an idle TPU; compare `value` against the same-day erf leg.
set -e
out="${1:-/tmp/bench_ablations}"
mkdir -p "$out"
echo "== production (auto = fast_gelu on bf16) =="
python bench.py | tee "$out/production.json"
echo "== gelu erf (reference-exact activation) =="
MDVIT_GELU=erf python bench.py | tee "$out/gelu_erf.json"
echo "== gelu tanh (stock constants) =="
MDVIT_GELU=tanh python bench.py | tee "$out/gelu_tanh.json"
echo "== ln native =="
MDVIT_GELU=erf MDVIT_LN_NATIVE=1 python bench.py | tee "$out/ln_native.json"
echo "== softmax native =="
MDVIT_GELU=erf MDVIT_SOFTMAX_NATIVE=1 python bench.py | tee "$out/softmax_native.json"
echo "== all three =="
MDVIT_GELU=tanh MDVIT_LN_NATIVE=1 MDVIT_SOFTMAX_NATIVE=1 \
    python bench.py | tee "$out/all.json"

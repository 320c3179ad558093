#!/bin/bash
# One-shot TPU measurement session: runs every queued benchmark/test from
# NEXT_STEPS.md in sequence and tees the logs under /tmp/tpu_session/.
# Fire this the moment the TPU relay is back:
#
#     bash benchmarks/tpu_session.sh
#
# It collects DATA ONLY — flipping kernel-default env values based on the
# A/B results (tpuvae/ops/tuning.py) stays a human/agent decision.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_session
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    echo "--- rc=$rc; tail of $OUT/$name.log:"
    tail -5 "$OUT/$name.log"
}

echo "probing TPU..."
if ! timeout 120 python -c "import jax; print(jax.devices())" > "$OUT/probe.log" 2>&1; then
    echo "TPU relay still down (probe timed out) — aborting"; exit 1
fi
grep -i tpu "$OUT/probe.log" || { echo "no TPU in probe output"; exit 1; }

# 1. tuning-kernel A/B: median radix bits x vote packing (~15 min w/ compiles)
run tuning_ab 2400 python benchmarks/tuning_ab.py

# 2. pairwise tile ranking vs the analytic default
run pairwise_tiles_ab 1800 python benchmarks/pairwise_tiles_ab.py

# 3. headline extraction bench at current defaults (4-bins-per-word vote
#    packing landed after the last recorded 5567 clips/s)
run bench_defaults 1800 python bench.py

# 4. serving-path throughput at production geometry + concurrent load
run serving_bench 3600 python benchmarks/serving_bench.py

# 5. FULL test suite on the real TPU with shipping defaults
run tpu_full_suite 7200 env TPUVAE_TEST_TPU=1 python -m pytest tests/ -q

echo "=== done; logs in $OUT ==="
echo "next: pick winning env defaults (tpuvae/ops/tuning.py), re-run"
echo "tests/test_ops.py on TPU, update docs/PERFORMANCE.md + BASELINE.md,"
echo "re-run python bench.py for the record, append docs/TPU_TEST_RUN_r2.log"

#!/bin/bash
# On-chip measurement runbook — run with the STOCK environment (axon relay
# attached) the moment a TPU window opens.  Ordered so the most valuable
# artifacts land first if the window closes early:
#   1. parity gates (cheap, certify correctness of the current tree)
#   2. sharded-vs-plain ratio A/B (queued since the one-pass-reduce and
#      donation-gating changes; ratio cancels chip-era drift)
#   3. fold-emit A/B (queued since the sixth session: in-kernel next-level
#      folds vs the per-trip XLA reduce, plain + sharded; flip the
#      PYITD_FOLD_EMIT default in decomp/itd.py and parallel/sharded.py
#      if both ratios < 1)
#   4. headline bench (driver-comparable JSON)
#   5. stage table (bench_profile)
# Each step is bounded; a hung relay fails the step, not the session.
set -u
cd "$(dirname "$0")/.."
# `python tools/x.py` puts tools/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
STAMP=$(date +%Y%m%d_%H%M%S)
OUT=profiles/onchip_$STAMP
mkdir -p "$OUT"
echo "== onchip checklist $STAMP (logs in $OUT) =="

probe() {
  timeout 120 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
}
if ! probe; then
  echo "relay DOWN (probe timed out) — aborting"; exit 1
fi
echo "relay UP: $(tail -1 "$OUT/probe.log")"

echo "== 1/5 on-chip parity gates =="
PYITD_ONCHIP_TESTS=1 timeout 3000 python -m pytest tests/test_onchip.py -q \
  2>&1 | tee "$OUT/onchip_tests.log" | tail -3

echo "== 2/5 sharded-vs-plain ratio =="
timeout 3000 python tools/ab_sharded_gap.py 2>&1 \
  | tee "$OUT/ab_sharded_gap.log" | tail -3

echo "== 3/5 fold-emit A/B =="
timeout 3000 python tools/ab_fold_emit.py 2>&1 \
  | tee "$OUT/ab_fold_emit.log" | tail -3

echo "== 4/5 headline bench =="
timeout 3000 python bench.py 2>&1 | tee "$OUT/bench.log" | tail -4

echo "== 5/5 stage table =="
timeout 3000 python bench_profile.py 2>&1 \
  | tee "$OUT/bench_profile.log" | tail -12

echo "== done; logs in $OUT =="

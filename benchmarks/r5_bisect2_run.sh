#!/bin/bash
# Session B: classic-only sub-bisect of round-4 commits + fetch probe.
# Commit order (oldest->newest): bf625c3 e284913 aefdece 11c9877 84ef2d1
# b6df9c3 196b8aa fe58454 1c5092a 63cc87e 9538c2a 926fe1f adea687 26d3548
# ed59160 394c940(HEAD)
set -u
REPO=/root/repo
HARNESS="$REPO/benchmarks/r5_regression_bisect.py"

run_arm() {
  local label="$1" dir="$2"
  echo "=== arm $label ==="
  mkdir -p "$dir/benchmarks"
  if [ "$dir" != "$REPO" ]; then cp "$HARNESS" "$dir/benchmarks/"; fi
  cp -n "$REPO/yanerf_tpu/native/_image_io.so" "$dir/yanerf_tpu/native/" 2>/dev/null || true
  (cd "$dir" && timeout 900 python -u benchmarks/r5_regression_bisect.py "$label" classic_ms)
  echo "=== arm $label done rc=$? ==="
}

for c in 1c5092a 63cc87e 9538c2a 26d3548; do
  d="/tmp/wt_$c"
  [ -d "$d" ] || git -C "$REPO" worktree add --detach "$d" "$c" >/dev/null 2>&1
  run_arm "$c" "$d"
done

echo "=== fetch probe ==="
(cd "$REPO" && timeout 1200 python -u benchmarks/r5_fetch_probe.py)
echo "SESSION B DONE"

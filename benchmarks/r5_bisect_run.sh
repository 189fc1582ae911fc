#!/bin/bash
# Sequential same-session regression bisect (see r5_regression_bisect.py).
# One TPU process at a time; arms run to completion (never killed).
set -u
REPO=/root/repo
OUT=/tmp/r5_bisect
mkdir -p "$OUT"
HARNESS="$REPO/benchmarks/r5_regression_bisect.py"

run_arm() {
  local label="$1" dir="$2"
  echo "=== arm $label (cwd $dir) ==="
  mkdir -p "$dir/benchmarks"
  cp "$HARNESS" "$dir/benchmarks/"
  # native decoder: reuse the prebuilt .so (identical source across rounds
  # except round-3 threading tweaks; the harness never decodes images)
  cp -n "$REPO/yanerf_tpu/native/_image_io.so" "$dir/yanerf_tpu/native/" 2>/dev/null || true
  (cd "$dir" && timeout 1500 python -u benchmarks/r5_regression_bisect.py "$label")
  echo "=== arm $label done rc=$? ==="
}

worktree_for() {
  local commit="$1" dir="$2"
  if [ ! -d "$dir" ]; then
    git -C "$REPO" worktree add --detach "$dir" "$commit" >/dev/null 2>&1
  fi
}

run_arm head_a "$REPO"
worktree_for 3698ea5 /tmp/wt_r3
run_arm r3_final /tmp/wt_r3
worktree_for f8d08b4 /tmp/wt_r2
run_arm r2_final /tmp/wt_r2
run_arm head_b "$REPO"
echo "ALL ARMS DONE"

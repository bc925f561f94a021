#!/bin/bash
# Capture a pre-warmed XLA:CPU suite cache for THIS host at the canonical
# cache path (see README.md — entries are fingerprint- and path-keyed).
# Writes tools/xla_prewarm/suite_full.<fingerprint>.tar.xz (~150 MB; kept
# local/untracked by default — commit only if your workflow really wants
# to trade repo size for one cold run per fresh host).
set -euo pipefail
cd "$(dirname "$0")/../.."
FP=$(python -c "from mmtpu.utils.compile_cache import _host_key; print(_host_key())")
DIR=".cache/jax/$FP"
if [ -d "$DIR" ] && [ -n "$(ls -A "$DIR" 2>/dev/null)" ]; then
  echo "backing up warm cache ($DIR -> /tmp/xla_prewarm_backup.$FP)"
  rm -rf "/tmp/xla_prewarm_backup.$FP"
  mv "$DIR" "/tmp/xla_prewarm_backup.$FP"
fi
mkdir -p "$DIR"
echo "cold suite capture at canonical path (expect ~11 min on 1 core)..."
time python -m pytest tests/ -q
tar cf - -C .cache/jax "$FP" | xz -2 > "tools/xla_prewarm/suite_full.$FP.tar.xz"
ls -la "tools/xla_prewarm/suite_full.$FP.tar.xz"
if [ -d "/tmp/xla_prewarm_backup.$FP" ]; then
  cp -rn "/tmp/xla_prewarm_backup.$FP/." "$DIR/" || true
  echo "merged prior warm entries back in"
fi

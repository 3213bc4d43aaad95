#!/usr/bin/env bash
# One-command verification of the whole framework (the CI drive referenced
# in PARITY.md §2.6): Python suite on the 8-device virtual CPU mesh, native
# runtime build + ctest (plain, TSAN, ASAN+UBSAN), the ctypes pipeline
# selftest, and the driver's multi-chip dry run.
#
# Usage: scripts/ci.sh [--fast]   (--fast skips the sanitizer builds and
# the end-to-end CLI smoke)
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=0
[[ "${1:-}" == "--fast" ]] && FAST=1

echo "== 1/5 Python suite (virtual 8-device CPU mesh)"
python -m pytest tests/ -x -q

echo "== 2/5 Native runtime: build (incl. ddsp~.pd_linux) + ctest"
BUILD=ddsp_pytorch_tpu/runtime/build
# Sanitizer options are passed explicitly either way: a cached ON from a
# previous non-fast configure must not leak into a --fast run.
if [[ $FAST -eq 0 ]]; then
  SAN_FLAGS=(-DDDSP_TSAN=ON -DDDSP_ASAN=ON)
else
  SAN_FLAGS=(-DDDSP_TSAN=OFF -DDDSP_ASAN=OFF)
fi
cmake -S ddsp_pytorch_tpu/runtime -B "$BUILD" "${SAN_FLAGS[@]}" >/dev/null
cmake --build "$BUILD" -j >/dev/null
# (cd, not `ctest --test-dir`: --test-dir needs CMake >= 3.20, the project
# minimum is 3.18)
(cd "$BUILD" && ctest --output-on-failure)

echo "== 3/5 ctypes pipeline selftest (C engine + embedded-Python model host)"
JAX_PLATFORMS='' python - <<'PY'
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from ddsp_pytorch_tpu.runtime import selftest
sys.exit(selftest.main())
PY

echo "== 4/5 Driver contract: multi-chip dry run (8-device virtual mesh)"
JAX_PLATFORMS='' XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8): OK')
"

if [[ $FAST -eq 0 ]]; then
  echo "== 5/5 End-to-end CLI smoke (preprocess → train → export → transfer → performance)"
  scripts/e2e_smoke.sh
else
  echo "== 5/5 skipped (--fast)"
fi

echo "CI: all green"

#!/bin/sh
# Run every native C++ engine under AddressSanitizer + UBSan on real
# regression data (the reference CI's ASanOpt regression analog,
# azure-pipelines.yml:36-39).  Uses the jax-free exerciser
# (tools/asan_exercise.py): ASan's __cxa_throw interceptor is
# incompatible with jaxlib's bundled nanobind/MLIR bindings, and the
# hand-written memory management all lives behind the ctypes surface.
# libasan is preloaded because python itself is uninstrumented; leak
# detection off for the same reason.
set -e
cd "$(dirname "$0")/.."
LIBASAN=$(g++ -print-file-name=libasan.so)
export SPACEDUST_NATIVE_SANITIZE=1
export LD_PRELOAD="$LIBASAN"
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1"
exec python tools/asan_exercise.py "$@"

#!/bin/sh
# Run the native-engine parity tests with the C++ engines built under
# AddressSanitizer + UBSan (the reference CI's ASanOpt regression run,
# azure-pipelines.yml:36-39).  libasan must be preloaded because python
# itself is uninstrumented; leak detection is disabled for the same
# reason (the interpreter "leaks" by design at exit).
set -e
cd "$(dirname "$0")/.."
LIBASAN=$(g++ -print-file-name=libasan.so)
export SPACEDUST_NATIVE_SANITIZE=1
export LD_PRELOAD="$LIBASAN"
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1"
export JAX_PLATFORMS=cpu
exec python -m pytest tests/test_prefilter_native.py tests/test_sw.py \
    tests/test_nucl.py tests/test_orftools.py tests/test_tail_parity.py \
    -q "$@"

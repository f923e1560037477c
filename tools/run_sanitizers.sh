#!/bin/bash
# Build the native runtime with TSAN / ASAN and exercise every threaded
# component (byte FIFO, threaded file sink, threaded MAC audio blocks /
# materialize / mux replay, NICAM batch encode) through the Python
# bindings.  Results are summarised on stdout; any sanitizer report
# fails the run.  (The reference has no sanitizer story at all —
# SURVEY.md section 5.)
set -e
cd "$(dirname "$0")/.."
SAN=${1:-thread}           # thread | address
OUT=/tmp/hacktv_san_$SAN
mkdir -p "$OUT"
case "$SAN" in
  thread)  FLAG=-fsanitize=thread;  PRELOAD=libtsan.so.2 ;;
  address) FLAG=-fsanitize=address; PRELOAD=libasan.so.8 ;;
  *) echo "usage: $0 [thread|address]"; exit 2 ;;
esac
g++ -O1 -g $FLAG -std=c++17 -fPIC -shared -pthread \
    -o "$OUT/libhacktv_rt.so" native/hacktv_rt.cpp
# point the runtime loader at the sanitized build
SANDIR="$OUT/native"
mkdir -p "$SANDIR"
cp native/hacktv_rt.cpp "$SANDIR/"
cp native/Makefile "$SANDIR/"
cp "$OUT/libhacktv_rt.so" "$SANDIR/"
touch "$SANDIR/libhacktv_rt.so"    # newer than the source: no rebuild
LOG="$OUT/report.txt"
LD_PRELOAD=$PRELOAD \
TSAN_OPTIONS="halt_on_error=0 exitcode=66 log_path=stderr" \
ASAN_OPTIONS="detect_leaks=0 exitcode=66" \
HACKTV_RT_DIR="$SANDIR" \
JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
python tools/sanitize_native.py 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
if [ $rc -ne 0 ]; then echo "SANITIZER ($SAN) RUN FAILED rc=$rc"; exit $rc; fi
if grep -qE "WARNING: ThreadSanitizer|ERROR: AddressSanitizer" "$LOG"; then
    echo "SANITIZER ($SAN) REPORTS FOUND"; exit 1
fi
echo "SANITIZER ($SAN) CLEAN"

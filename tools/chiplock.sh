#!/bin/bash
# Run one measurement step under the shared chip lock so the driver's
# bench.py capture never races a chain on the one TPU chip (the
# BENCH_r03 self-contention failure).  Usage:
#   tools/chiplock.sh <timeout-seconds> <command...>
# The lock is released between steps, letting bench.py slot in.
set -u
TIMEOUT_S="$1"; shift
export DFX_CHIP_LOCK_HELD=1   # tell bench.py not to re-acquire
exec flock -w 3600 /root/repo/.chip.lock timeout "$TIMEOUT_S" "$@"

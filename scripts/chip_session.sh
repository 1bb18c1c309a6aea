#!/bin/bash
# Sequential chip-job runbook for when the TPU relay is available.
# ONE TPU process at a time (the relay grant serializes anyway), generous
# timeouts, incremental logs under /tmp/chip/.  Usage:
#   bash scripts/chip_session.sh [stage ...]   # default: all stages
# Stages: parity spatial native bench
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip
stages=${*:-"parity spatial native bench"}

run() { # name timeout cmd...
    local name=$1 t=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
    timeout "$t" "$@" >"/tmp/chip/$name.log" 2>&1
    local rc=$?
    echo "=== $name done rc=$rc ===" | tee -a /tmp/chip/driver.log
    tail -5 "/tmp/chip/$name.log"
    return $rc
}

for s in $stages; do
  case $s in
    parity)  run parity  1200 python scripts/validate_on_chip.py ;;
    spatial) run spatial 1800 python scripts/dev_spatial_ablate.py 4 ;;
    native)  run native  2400 python scripts/dev_native_ablate.py 8 ;;
    bench)   run bench   3600 python bench.py --all ;;
    *) echo "unknown stage $s" ;;
  esac
done

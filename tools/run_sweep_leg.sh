#!/bin/bash
# Run one third of the registry through the exact oracle check at a given SF.
# Usage: run_sweep_leg.sh <sf_dir> <leg 0|1|2> <logfile>
set -u
SF="$1"; LEG="$2"; LOG="$3"
cd /root/repo
NAMES=$(python -c "
import sys; sys.path.insert(0,'/root/repo')
import __spark_entry__ as e
ns = sorted(e.queries())
print(' '.join(ns[int('$LEG')::3]))
" 2>/dev/null)
if [ -z "$NAMES" ]; then
    echo "=== $(basename "$SF") exact leg$LEG $(date -u): ABORT — registry import failed, no names ===" >> "$LOG"
    exit 1
fi
echo "=== final $(basename "$SF") exact leg$LEG $(date -u) ===" >> "$LOG"
python tools/check_oracle.py --exact --require-rows "$SF" $NAMES >> "$LOG" 2>&1

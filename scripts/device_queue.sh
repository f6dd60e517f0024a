#!/bin/bash
# Sequential device job queue with wedge-aware probing.
#
# The remote-TPU tunnel wedges for 10-90 min at a time (CLAUDE.md); this
# runner probes with a short-timeout subprocess before each job and sleeps
# through wedges, so queued device work lands whenever the worker is
# healthy.  Each job runs under its own timeout; logs to /tmp/devq_<name>.log.
#
# Usage: nohup bash scripts/device_queue.sh > /tmp/devq.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 75 python -c "
import warnings; warnings.filterwarnings('ignore')
import jax, jax.numpy as jnp
(jnp.arange(4)+1).block_until_ready()
print('OK')" 2>/dev/null | grep -q OK
}

wait_healthy() {
    local n=0
    until probe; do
        n=$((n+1))
        echo "$(date +%T) device wedged; sleep 300 (probe $n)"
        sleep 300
    done
    echo "$(date +%T) device healthy"
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    echo "=== $(date +%T) job $name: $*"
    wait_healthy
    timeout "$tmo" "$@" > "/tmp/devq_${name}.log" 2>&1
    local rc=$?
    echo "=== $(date +%T) job $name exit $rc (log /tmp/devq_${name}.log)"
}

run_job ab512 2700 python -u scripts/tpu_frame_ab.py 512x512 16 \
    "bitsru8:2048:4:6,bitsru8:2048:4:6:0:morton"
run_job bench 2400 python -u bench.py
run_job validate 2400 python -u scripts/device_validate.py \
    --algos=bits,bitsr,bitsru8
run_job instanced 2400 python -u scripts/tpu_instanced_ab.py
run_job config2 2400 python -u scripts/run_configs.py 2
run_job config3 2400 python -u scripts/run_configs.py 3
echo "=== $(date +%T) queue done"

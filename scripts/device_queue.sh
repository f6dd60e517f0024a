#!/bin/bash
# Sequential device job queue with wedge-aware probing AND a stuck-client
# watchdog.
#
# Two distinct remote-TPU failure modes (measured 2026-08-21):
#  1. worker wedge: every client (including fresh probes) hangs 10-90 min;
#  2. stuck client: ONE process hangs at startup (~0 CPU, no output) while
#     the worker stays healthy — killing that client fixes it instantly.
# This runner probes before each job (mode 1) and kills+retries a job
# whose python child burns <5s CPU in its first 4 minutes (mode 2).
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

cpu_secs() {  # cumulative CPU seconds of pid + children
    local total=0 t
    for p in "$1" $(ps -o pid= --ppid "$1" 2>/dev/null); do
        t=$(ps -o cputimes= -p "$p" 2>/dev/null | tr -d ' ')
        total=$((total + ${t:-0}))
    done
    echo "$total"
}

run_job() {
    # Stuck-client detection over the job's WHOLE life: a healthy device
    # job prints (or burns CPU) regularly; kill+retry when BOTH the log
    # mtime is stale >8 min AND cumulative CPU grew <3s over that window.
    local name="$1" tmo="$2"; shift 2
    local attempt rc pid log="/tmp/devq_${name}.log"
    for attempt in 1 2 3; do
        echo "=== $(date +%T) job $name try $attempt: $*"
        wait_healthy
        timeout "$tmo" "$@" > "$log" 2>&1 &
        pid=$!
        local stuck=0 last_cpu=0 stale=0
        while kill -0 "$pid" 2>/dev/null; do
            sleep 60
            kill -0 "$pid" 2>/dev/null || break
            local age cpu
            age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
            cpu=$(cpu_secs "$pid")
            if [ "$age" -ge 480 ] && [ $((cpu - last_cpu)) -lt 3 ]; then
                stale=$((stale+1))
            else
                stale=0
            fi
            last_cpu=$cpu
            if [ $stale -ge 2 ]; then stuck=1; break; fi
        done
        if [ $stuck -eq 1 ]; then
            echo "=== $(date +%T) job $name stuck (stale log, idle CPU); kill+retry"
            kill -9 "$pid" $(ps -o pid= --ppid "$pid") 2>/dev/null
            wait "$pid" 2>/dev/null
            continue
        fi
        wait "$pid"; rc=$?
        echo "=== $(date +%T) job $name exit $rc (log $log)"
        return $rc
    done
    echo "=== $(date +%T) job $name gave up after 3 stuck attempts"
    return 99
}

# ---- job list (edit per session) -------------------------------------
# fixedprof5, rowacct512 done
run_job blocksweep 4500 python -u scripts/tpu_block_sweep.py
run_job twolevelp_ab 5400 python -u scripts/tpu_twolevelp_ab.py
# bench done (493.9k rays/s, unchanged)
echo "=== $(date +%T) queue done"

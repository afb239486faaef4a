#!/bin/bash
# Round-3 chip-return queue (docs/ROADMAP.md "queued on the probe
# flipping to 'up'"): runs the TPU-gated items serially, shortest
# diagnostics first, long training runs last. Idempotent: each item
# skips itself if its .done marker exists, so the script can be
# relaunched after a chip flap without repeating finished work.
#
# Usage: runs/chip_queue.sh [stop_epoch]
#   stop_epoch: unix time after which no NEW item starts and the
#   bounded bcc-Li training window ends (default: now + 8h).
set -u
cd /root/repo
STOP=${1:-$(( $(date +%s) + 8*3600 ))}
Q=runs
mark() { touch "$Q/q_$1.done"; }
have() { [ -f "$Q/q_$1.done" ]; }
left() { echo $(( STOP - $(date +%s) )); }

run_item() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  have "$name" && { echo "queue: $name already done"; return; }
  [ "$(left)" -le 0 ] && { echo "queue: past stop time, skip $name"; return; }
  echo "queue: START $name ($(date -u)) timeout=${tmo}s"
  timeout "$tmo" "$@" > "$Q/q_$name.log" 2>&1
  local rc=$?
  echo "queue: END $name rc=$rc"
  # rc!=0 still marks done: a hung/failed diagnostic should not wedge
  # the queue; the log records what happened.
  mark "$name"
}

echo "queue: starting at $(date -u), stop at $(date -u -d @"$STOP")"

# 1. bench recapture — the Gauss-split det head landed after the
#    143.2/8.13x capture (runs/bench_r3_capture.json)
run_item bench 2400 python bench.py

# 2. component-level timing: where do the milliseconds go?
#    (includes the det GJ-kernel vs XLA-LU A/B, ops/pallas/det_kernels.py)
run_item engine_profile 2400 python benchmarks/engine_profile.py 256 64

# 2b. end-to-end bench with the det kernel forced on: if this beats the
#     item-1 capture, flip debug.det_kernel auto to TPU-on
run_item bench_detk 2400 env DEEPSOLID_TPU_DET_KERNEL=on python bench.py

# 2c. full-train-step A/B of the det kernel (sampler value path + jets)
run_item detk_step_ab 6000 python runs/detk_step_ab.py

# 3a. tangent-tier rate A/B on the bench network
run_item tangent_ab_rate 2400 python benchmarks/tangent_prec_ab.py - diamond-bench
# 3b. tangent-tier accuracy A/B on the trained LiH state
run_item tangent_ab_lih 3600 python benchmarks/tangent_prec_ab.py runs/lih_r2 lih

# 4. H10 importance-sampling training A/B (6 sweeps vs 20 all-electron)
run_item h10_imp 10800 bash runs/watchdog.sh runs/h10_imp_run.py \
  /root/repo/runs/h10_imp_r3 /root/repo/runs/h10_imp_r3.log 900

# 5. Si diamond sto-3g end-to-end (third-row solid, VERDICT r2 missing #1)
run_item si_diamond 14400 bash runs/watchdog.sh runs/si_diamond_run.py \
  /root/repo/runs/si_r3 /root/repo/runs/si_r3.log 900

# 6. bcc-Li 3x3x3 (BASELINE system #4): train until the stop time.
#    watchdog restarts on tunnel stalls; elastic restore resumes.
if ! have bcc_li && [ "$(left)" -gt 1800 ]; then
  echo "queue: START bcc_li for $(left)s"
  timeout "$(left)" bash runs/watchdog.sh runs/bcc_li_run.py \
    /root/repo/runs/bcc_li_r3 /root/repo/runs/bcc_li_r3.log 900
  echo "queue: END bcc_li rc=$?"
  mark bcc_li
fi

echo "queue: all items processed at $(date -u)"

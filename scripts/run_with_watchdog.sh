#!/usr/bin/env bash
# Attempt-loop for long TPU experiment runs on a remote-tunnelled accelerator.
#
# The tunnelled worker occasionally wedges (a device call blocks behind a
# remote compile queue for tens of minutes) or kills long executions.  The
# experiment CLIs checkpoint every iteration (checkpoint.npz in the output
# dir) and resume exactly, so the cheapest reliable driver is: run the CLI,
# watch the checkpoint mtime, kill-and-relaunch the attempt when saves stall,
# until summary.json appears or an overall deadline passes.  Progress is
# never lost across attempts (or across invocations of this script).
#
# Usage:
#   scripts/run_with_watchdog.sh OUTPUT_DIR DEADLINE_S [STALL_S] [GRACE_S] -- CMD...
#
#   OUTPUT_DIR  experiment output dir (must match the CMD's --output-dir)
#   DEADLINE_S  overall wall-clock budget for this invocation
#   STALL_S     max gap between checkpoint saves once saving started (420)
#   GRACE_S     max SILENCE before the first save: remote compiles /
#               executable loads produce no output for this long (1800).
#               Writes to OUTPUT_DIR/info.log (e.g. init progress blocks)
#               reset the silence clock, so a long chain-init that logs
#               every block is never killed mid-flight — only a genuinely
#               quiet attempt is.
#   CMD...      the experiment command to (re)launch each attempt
#
# Example:
#   scripts/run_with_watchdog.sh experiments/foo 7200 -- \
#     python scripts/fhn_model_noisy_obs_hmc_experiment.py \
#       --output-dir experiments/foo --num-chain 256 ...
set -u
OUT=$1; shift
DEADLINE_S=$1; shift
STALL=420
GRACE=1800
if [ "${1:-}" != "--" ]; then STALL=$1; shift; fi
if [ "${1:-}" != "--" ]; then GRACE=$1; shift; fi
[ "${1:-}" = "--" ] && shift
CK=$OUT/checkpoint.npz
DEADLINE=$(( $(date +%s) + DEADLINE_S ))
i=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  [ -f "$OUT/summary.json" ] && { echo "[watchdog] summary.json exists; done"; exit 0; }
  i=$((i+1))
  echo "[watchdog] attempt $i ($(date -Is)): $*"
  "$@" &
  pid=$!
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    if [ "$now" -ge "$DEADLINE" ]; then
      echo "[watchdog] overall deadline; stopping attempt"
      kill "$pid"; break
    fi
    ck=0; [ -f "$CK" ] && ck=$(stat -c %Y "$CK")
    if [ "$ck" -gt "$start" ]; then
      age=$(( now - ck ))
      if [ "$age" -gt "$STALL" ]; then
        echo "[watchdog] save gap ${age}s > ${STALL}s; killing wedged attempt"
        kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; break
      fi
    else
      # Pre-first-save phase: treat info.log appends (init block progress,
      # pre-flight prints) as liveness — kill only after GRACE seconds of
      # total silence.  (2026-08-19: a healthy 256-chain SIR init outlived
      # the old from-start grace and was killed at 255/256 converged.)
      live=$start
      if [ -f "$OUT/info.log" ]; then
        il=$(stat -c %Y "$OUT/info.log")
        [ "$il" -gt "$live" ] && live=$il
      fi
      if [ $(( now - live )) -gt "$GRACE" ]; then
        echo "[watchdog] no save and ${GRACE}s of silence; killing attempt"
        kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; break
      fi
    fi
  done
  wait "$pid" 2>/dev/null
  [ -f "$OUT/summary.json" ] && { echo "[watchdog] done"; exit 0; }
  sleep 15
done
echo "[watchdog] overall deadline reached; checkpoint preserved for resume"
exit 2

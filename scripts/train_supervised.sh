#!/usr/bin/env bash
# Supervised training launcher: restarts decnet_tpu.cli.train whenever it
# exits with code 75 (the RSS-guard checkpoint-and-restart signal, see
# TrainConfig.max_rss_gb) so long runs survive the remote-TPU client's
# per-transfer host-memory leak (scripts/diag_leak.py). All arguments are
# passed through to the train CLI; resume is automatic via the Orbax
# checkpoint directory.
#
# Codes 137/143 (SIGKILL/SIGTERM) are also restartable, up to 3 times: the
# remote-TPU tunnel can wedge the client mid-step (observed 2026-08-21:
# futex-wait at 0% CPU, no progress for 18 min) and an external watchdog
# kills the hung python; training then resumes from the last checkpoint.
set -uo pipefail
hang_retries=0
while true; do
  python -u -m decnet_tpu.cli.train "$@"
  code=$?
  if [ "$code" -eq 75 ]; then
    echo "train requested restart (75); resuming..."
    continue
  fi
  if [ "$code" -eq 137 -o "$code" -eq 143 ] && [ "$hang_retries" -lt 3 ]; then
    hang_retries=$((hang_retries + 1))
    echo "train killed (code $code; watchdog/hang?); resume attempt $hang_retries/3"
    sleep 10
    continue
  fi
  echo "train exited with code $code; supervisor done"
  exit "$code"
done

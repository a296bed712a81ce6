#!/usr/bin/env bash
# Supervised training launcher: restarts decnet_tpu.cli.train whenever it
# exits with code 75 (the RSS-guard checkpoint-and-restart signal, see
# TrainConfig.max_rss_gb) so long runs survive the remote-TPU client's
# per-transfer host-memory leak (scripts/diag_leak.py). All arguments are
# passed through to the train CLI; resume is automatic via the Orbax
# checkpoint directory.
set -uo pipefail
while true; do
  python -u -m decnet_tpu.cli.train "$@"
  code=$?
  if [ "$code" -ne 75 ]; then
    echo "train exited with code $code; supervisor done"
    exit "$code"
  fi
  echo "train requested restart (75); resuming..."
done

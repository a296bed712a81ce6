#!/usr/bin/env bash
# Watchdog for remote-TPU tunnel hangs: if the given log file stops growing
# for STALL_SECS, kill the python leaf of the given process TREE (never a
# pattern match — only descendants of the supplied root PID are considered;
# train_supervised.sh treats 137 as restartable and resumes from the last
# Orbax checkpoint).
#   usage: hang_watchdog.sh <root_pid> [stall_secs]
# Watches the newest runs/train_*.log; only ever kills a descendant of
# <root_pid> whose cmdline is the decnet train CLI (training logs a line
# every ~20 s, so a stall there is unambiguous; eval/bench phases have no
# live train python and are never touched).
set -u
root="$1"; stall="${2:-480}"

descendants() {   # all descendant PIDs of $1
  local p kids
  kids=$(ps -o pid= --ppid "$1" 2>/dev/null)
  for p in $kids; do
    echo "$p"
    descendants "$p"
  done
}

while kill -0 "$root" 2>/dev/null; do
  sleep 60
  log=$(ls -t runs/train_*.log 2>/dev/null | head -1)
  [ -n "$log" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$log") ))
  if [ "$age" -gt "$stall" ]; then
    for p in $(descendants "$root"); do
      if tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null \
          | grep -q "decnet_tpu.cli.train"; then
        echo "$(date): $log stalled ${age}s; killing train pid $p (child of $root)"
        kill -9 "$p"
      fi
    done
    sleep 120
  fi
done

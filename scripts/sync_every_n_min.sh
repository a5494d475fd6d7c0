#!/bin/bash
# Periodic log/sample sync loop.
#
# TPU-native counterpart of the reference's self-rescheduling
# `sync_every_n_min.sh` (reference repo root): every N minutes, rsync the
# training log directory to a remote host, excluding bulky artifacts.
#
# Usage: scripts/sync_every_n_min.sh N_MINUTES DEST [SRC]
#   DEST  rsync destination (user@host:path)
#   SRC   source dir (default: logs/)
set -u
N=${1:?usage: sync_every_n_min.sh N_MINUTES DEST [SRC]}
DEST=${2:?destination (user@host:path) required}
SRC=${3:-logs/}
cd "$(dirname "$0")/.."

while true; do
  echo "[$(date -Is)] rsync $SRC -> $DEST"
  rsync -avKL \
    --exclude='*.png' --exclude='*.txt' --exclude='*/embeddings.pt' \
    --info=progress2 "$SRC" "$DEST" \
    >> sync_every_n_min.log 2>&1
  sleep $((N * 60))
done

#!/bin/sh
# Periodic log/checkpoint sync (`sync_every_n_min.sh` equivalent).
#
#   scripts/sync_every_n_min.sh <minutes> <src_dir> <dest (rsync target)>
set -e
N_MIN=${1:?minutes}; SRC=${2:?src}; DEST=${3:?dest}
while true; do
  echo "[$(date)] rsync $SRC -> $DEST"
  rsync -a --exclude 'profile/' "$SRC" "$DEST" || true
  sleep "$((N_MIN * 60))"
done

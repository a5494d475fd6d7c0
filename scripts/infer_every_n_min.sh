#!/bin/sh
# Self-rescheduling periodic evaluation during training
# (`infer_every_n_min.sh` equivalent): every N minutes run the eval
# generator against the latest checkpoint.
#
#   scripts/infer_every_n_min.sh <minutes> <log_dir> <subjects_root> [extra args...]
set -e
N_MIN=${1:?minutes}; LOG_DIR=${2:?log_dir}; SUBJECTS=${3:?subjects_root}
shift 3
while true; do
  CKPT=$(ls -dt "$LOG_DIR"/checkpoints/embeddings_gs-* 2>/dev/null | head -1 || true)
  if [ -n "$CKPT" ]; then
    echo "[$(date)] evaluating $CKPT"
    python "$(dirname "$0")/gen_prompts_and_eval.py" \
      --subjects_root "$SUBJECTS" \
      --out_root "$LOG_DIR/eval" \
      --scores_csv "$LOG_DIR/eval/scores.csv" \
      --extra_args --adaface_ckpt "$CKPT" "$@" || true
  else
    echo "[$(date)] no checkpoint yet in $LOG_DIR"
  fi
  sleep "$((N_MIN * 60))"
done

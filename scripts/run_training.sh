#!/usr/bin/env bash
# Ops launcher: capability parity with the reference's run_nexar_training.sh
# (/root/reference/run_nexar_training.sh: commands single | distributed [N] |
# grid-search | test | check, env-var config block :13-22, GPU-count clamp
# :124-129) — TPU-native: no torchrun; one controller process drives every
# local chip through the mesh, and N limits the data-parallel width.
set -euo pipefail

# ---- configuration (env-var overridable, like the reference's block) ----
METADATA_CSV="${METADATA_CSV:-}"
VIDEO_DIRS="${VIDEO_DIRS:-}"
BACKBONE="${BACKBONE:-convnext_tiny}"
TEMPORAL_MODE="${TEMPORAL_MODE:-gru}"
EPOCHS="${EPOCHS:-15}"
BATCH_SIZE="${BATCH_SIZE:-8}"            # per device
LEARNING_RATE="${LEARNING_RATE:-1e-4}"
SAVE_DIR="${SAVE_DIR:-runs}"
SAMPLE_STRATEGY="${SAMPLE_STRATEGY:-random}"
PYTHON="${PYTHON:-python}"

usage() {
  cat <<EOF
Usage: $0 {single|distributed [N]|grid-search|test|check}

  single          train on one device
  distributed [N] data-parallel training over min(N, available) devices
  grid-search     sweep backbones x temporal modes x learning rates
  test            1-epoch synthetic smoke run into \${SAVE_DIR}_test
  check           verify environment, package imports, data paths

Config via env vars: METADATA_CSV VIDEO_DIRS BACKBONE TEMPORAL_MODE EPOCHS
BATCH_SIZE LEARNING_RATE SAVE_DIR SAMPLE_STRATEGY
Grid-search axes:    GRID_BACKBONES GRID_TEMPORAL_MODES GRID_LRS
EOF
  exit 1
}

common_args() {
  local args=(--backbone "$BACKBONE" --temporal-mode "$TEMPORAL_MODE"
              --epochs "$EPOCHS" --batch-size "$BATCH_SIZE"
              --learning-rate "$LEARNING_RATE" --save-dir "$SAVE_DIR"
              --sample-strategy "$SAMPLE_STRATEGY")
  if [[ -n "$METADATA_CSV" ]]; then
    args+=(--metadata-csv "$METADATA_CSV")
  fi
  if [[ -n "$VIDEO_DIRS" ]]; then
    # shellcheck disable=SC2206
    args+=(--video-dirs $VIDEO_DIRS)
  fi
  echo "${args[@]}"
}

check() {
  echo "== environment check (reference check_requirements parity) =="
  $PYTHON - <<'PY'
import jax
print(f"jax {jax.__version__}; devices: {jax.devices()}")
import vision_collision_detection_tpu as vcd
print(f"package {vcd.__version__} imports OK")
from vision_collision_detection_tpu.media.build import ensure_built
print(f"media library: {ensure_built()}")
PY
  if [[ -n "$METADATA_CSV" ]]; then
    [[ -f "$METADATA_CSV" ]] && echo "metadata CSV: $METADATA_CSV OK" \
      || { echo "ERROR: missing $METADATA_CSV"; exit 1; }
  fi
  for d in $VIDEO_DIRS; do
    [[ -d "$d" ]] && echo "video dir: $d OK" \
      || { echo "ERROR: missing dir $d"; exit 1; }
  done
  echo "check passed"
}

case "${1:-}" in
  single)
    # shellcheck disable=SC2046
    $PYTHON -m vision_collision_detection_tpu.cli.train \
      $(common_args) --single-device --test
    ;;
  distributed)
    N="${2:-0}"
    AVAIL=$($PYTHON -c "import jax; print(jax.device_count())")
    if [[ "$N" -gt 0 && "$N" -lt "$AVAIL" ]]; then
      echo "clamping data-parallel width to $N of $AVAIL devices"
      export VCD_NUM_DATA="$N"
    fi
    echo "effective global batch: $((BATCH_SIZE * ${N:-$AVAIL}))"
    # shellcheck disable=SC2046
    $PYTHON -m vision_collision_detection_tpu.cli.train \
      $(common_args) --data-parallel --test
    ;;
  grid-search)
    # Axes env-var overridable; LR axis mirrors the reference grid
    # (/root/reference/nexar_complete.py:677-679: 2 models x 3 modes x 2 LRs)
    # shellcheck disable=SC2046,SC2086
    $PYTHON -m vision_collision_detection_tpu.cli.grid_search $(common_args) \
      --backbones ${GRID_BACKBONES:-resnet18 convnext_tiny} \
      --temporal-modes ${GRID_TEMPORAL_MODES:-attention gru lstm} \
      --learning-rates ${GRID_LRS:-1e-4 5e-5}
    ;;
  test)
    $PYTHON -m vision_collision_detection_tpu.cli.train \
      --synthetic 3 --save-dir "${SAVE_DIR}_test" \
      --backbone "$BACKBONE" --temporal-mode "$TEMPORAL_MODE" \
      --fps 5 --duration 1 --frame-size 64 --batch-size 2 \
      --epochs 1 --validation-freq 0 --test \
      --experiment-name smoke
    ;;
  check)
    check
    ;;
  *)
    usage
    ;;
esac

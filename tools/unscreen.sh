#!/bin/bash
# Shell launcher — same surface as the reference tools/unscreen.sh:
#   bash tools/unscreen.sh <script> <src_video_id> <device_id> [extra args]
# <device_id> selects the JAX default device (the reference exported
# CUDA_VISIBLE_DEVICES; here one process maps to one TPU chip).

script=$1
src=$2
dev_id=$3
PY_ARGS=${@:4}
echo "unscreen video ${src} on device ${dev_id}"

if [ -z "${dev_id}" ]; then
    echo "Device not set. Using default device 0"
    dev_id="0"
fi

export PYTHONPATH=./:${PYTHONPATH}
UNSCREEN_DEVICE_ID=${dev_id} python tools/unscreen/${script}.py --video_id ${src} ${PY_ARGS}
echo "finished video ${src} on device ${dev_id}"

#!/bin/sh
# Combine the per-frame segmentation PNGs written by `predict` into an mp4
# for qualitative review (reference tools/convert.sh).
#
# Usage: scripts/convert.sh <run_name> [video_id]
# Reads  logs/<run>/frames/<video_id>/%d.png -> logs/<run>/frames/<video_id>.mp4
set -e
RUN="$1"
VID="${2:-0}"
ffmpeg -framerate 25 -i "logs/$RUN/frames/$VID/%d.png" \
    -vcodec mpeg4 -b:v 2M "logs/$RUN/frames/$VID.mp4"

#!/bin/sh
# Re-encode a source video for MV extraction (no B-frames, 25fps, 1920x1072)
# and extract frames + block-MV grids.
# Reference: /root/reference/dataset/flow/ingress_new_video.sh
set -e
ffmpeg -i "$1".webm -c:v libx264 -x264opts bframes=0 -partitions none \
    -filter:v fps=25,scale=1920x1072 "$1".mp4
python -m floodseg_tpu.data.tools.extract_motion_vectors "$1".mp4

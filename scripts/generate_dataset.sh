#!/bin/bash
# Build the UAV-5 dataset from the two source YouTube videos.
# Reference: /root/reference/dataset/flow/generate_dataset.sh
set -e
yt-dlp -o florida https://www.youtube.com/watch?v=VF1CMbPlmPo
yt-dlp -o texas https://www.youtube.com/watch?v=SybD-lXqYR8
./scripts/ingress_new_video.sh florida
./scripts/ingress_new_video.sh texas
python -m floodseg_tpu.data.tools.make_flow --root .

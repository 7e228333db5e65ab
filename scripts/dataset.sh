#!/bin/bash
# Generate multi-view point cloud sequences (reference scripts/dataset.sh parity)
python -m autourdf_tpu.cli dataset --robot "${1:-wx200_5}" "${@:2}"

#!/bin/bash
# Structure discovery -> URDF (reference scripts/generate_urdf.sh parity)
python -m autourdf_tpu.cli urdf --robot "${1:-wx200_5}" --unknown-dof --end-video 5 "${@:2}"

#!/bin/bash
# Cluster registration over all sequences (reference scripts/registration.sh parity)
python -m autourdf_tpu.cli register --robot "${1:-wx200_5}" "${@:2}"

#!/bin/bash
python -m autourdf_tpu.cli evaluate --robot "${1:-wx200_5}" "${@:2}"

#!/usr/bin/env bash
# Run the test suite on the simulated 8-device CPU mesh.
#
# IMPORTANT on this image: clearing PALLAS_AXON_POOL_IPS skips the axon TPU
# PJRT registration at interpreter start. Without it, every python process
# (even CPU-only tests) dials the TPU tunnel, which can wedge a concurrently
# running TPU job.
set -e
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"

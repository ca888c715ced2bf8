#!/bin/bash
# CPU test runner. PALLAS_AXON_POOL_IPS must be cleared BEFORE python starts:
# sitecustomize.py registers the axon TPU-relay plugin when it is set, and the
# relay serializes every JAX process on this box (even CPU-only ones).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest "$@"

"""Test harness: force an 8-device virtual CPU mesh as the multi-chip stand-in
(SURVEY.md §4: mesh tests on CPU with xla_force_host_platform_device_count)."""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel),
# which must never be touched by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

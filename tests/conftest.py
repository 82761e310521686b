"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) so the
distributed code runs without a pod. Must set env before importing jax.
"""

import os
import sys

# FORCE cpu — the driver environment exports JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must not serialize over it (setdefault is not enough).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) so the
distributed code runs without a pod. Must set env before importing jax.
"""

import os
import sys

# FORCE cpu — the driver environment exports JAX_PLATFORMS=axon (the real
# TPU tunnel) AND the axon sitecustomize calls
# jax.config.update('jax_platforms', 'axon,cpu') at interpreter start,
# which overrides the env var. Tests must not serialize over the TPU
# tunnel, so update the CONFIG after import (env alone is ignored).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

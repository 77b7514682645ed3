"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake cluster (SURVEY.md section 4):
multi-device sharding tests execute on host CPU devices, so the suite runs
anywhere.  The session presets JAX_PLATFORMS=axon and a sitecustomize that
registers the TPU plugin at interpreter start, so the env var alone is too
late — force the platform through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

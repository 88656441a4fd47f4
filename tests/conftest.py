"""Test configuration: run everything on a virtual 8-device CPU mesh.

NB the environment's sitecustomize registers the axon TPU plugin and sets
jax_platforms="axon,cpu" via jax.config — env vars like JAX_PLATFORMS are
overridden, so we must force the CPU platform through jax.config here.
Multi-chip sharding is validated on 8 virtual CPU devices; the driver
separately dry-runs the multi-chip path and benches on real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # read by any subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to the XLA flag
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
jax.config.update("jax_enable_x64", False)

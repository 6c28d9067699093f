"""Force an 8-device virtual CPU mesh for all tests.

TPU hardware in CI is a single (remote-tunneled) chip; tests run on XLA's
host platform with 8 virtual devices instead (SURVEY.md §7.2 L5). The axon
sitecustomize force-selects `jax_platforms="axon,cpu"` at interpreter
startup, so the env var alone is not enough — we must override the jax
config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

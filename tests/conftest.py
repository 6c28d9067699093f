"""Force an 8-device virtual CPU mesh for all tests.

TPU hardware in CI is a single chip; sharding tests run against
XLA's host-platform device virtualization instead (SURVEY.md §7.2 L5).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test config: force a virtual 8-device CPU mesh before JAX imports.

This gives multi-chip sharding tests without TPU hardware — the
multi-node simulation the reference never had (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

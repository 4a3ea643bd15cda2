"""Test configuration: force an 8-device CPU JAX platform.

Tests validate numerics; the real-TPU path is exercised by bench.py and
__graft_entry__.py.  The multi-device CPU mesh validates the sharded code
paths exactly as the driver's dryrun does.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

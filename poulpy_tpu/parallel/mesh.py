"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    """(dp, tp) mesh: dp shards ciphertext batches, tp shards the CRT prime
    basis.  tp must divide both n_devices and the module's prime count."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % tp == 0
    dp = n_devices // tp
    arr = np.array(devices[:n_devices]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))

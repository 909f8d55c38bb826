"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None, frames_axis: int | None = None):
    """Build a (frames, points) mesh over the first `n_devices` devices.

    With >= 4 devices the mesh is 2D (2 x n/2 by default); otherwise all
    devices go to the ``points`` axis (the dominant parallelism).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if frames_axis is None:
        frames_axis = 2 if n >= 4 and n % 2 == 0 else 1
    points_axis = n // frames_axis
    arr = np.array(devices[: frames_axis * points_axis]).reshape(
        frames_axis, points_axis)
    return Mesh(arr, ("frames", "points"))


def shard_spec(mesh: Mesh, *axis_names):
    """NamedSharding for a PartitionSpec given per-dimension axis names
    (None = replicated dim)."""
    return NamedSharding(mesh, PartitionSpec(*axis_names))

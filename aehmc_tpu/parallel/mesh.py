"""Device-mesh construction and chain-axis sharding helpers."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


CHAIN_AXIS = "chains"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = CHAIN_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 1-D mesh over the chain axis.

    Chains are embarrassingly parallel, so a flat mesh over all chips (ICI
    ring on a slice) is the right layout; pooled-adaptation all-reduces ride
    ICI.  For multi-slice (DCN) scale-out pass an explicit device list.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def chain_sharding(mesh: Mesh, axis_name: str = CHAIN_AXIS) -> NamedSharding:
    """Sharding that splits the leading (chain) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates a value on every device."""
    return NamedSharding(mesh, PartitionSpec())

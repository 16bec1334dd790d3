"""Device mesh construction and multi-host initialization."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """A mesh over the first `n_devices` local (or all global) devices.

    1-D data mesh by default; pass `shape` + `axis_names` for 2-D
    (data x model) meshes used by the edge-partitioned mode.
    """
    if n_devices is not None:
        # slicing must take LOCAL devices: a global-list slice on a
        # multi-host run would hand process 1 a mesh over process 0's
        # (non-addressable) devices
        devices = jax.local_devices()[:n_devices]
    else:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host DCN rendezvous (replaces NCCL init_process_group,
    reference train_alignn.py:27-38)."""
    if coordinator_address is None and (num_processes is not None
                                        or process_id is not None):
        raise ValueError(
            "num_processes/process_id require coordinator_address — "
            "silently falling back to auto-detection would ignore the "
            "explicit process identity")
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address)
    if num_processes is not None:
        kwargs.update(num_processes=num_processes)
    if process_id is not None:
        kwargs.update(process_id=process_id)
    jax.distributed.initialize(**kwargs)

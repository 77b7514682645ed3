"""Device-mesh construction.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather over local GPUs (``vqa/models/utils.py:22-24``,
``convnets.py:91-93``).  The TPU-native equivalent is a
``jax.sharding.Mesh`` whose 'data' axis carries the batch: pjit shards inputs,
replicates params, and XLA inserts the gradient all-reduce over ICI.  A second
'model' axis is available for sharding the candidate axis / the kNN corpus
(SURVEY.md section 2.4).  Multi-host (DCN) layouts come from
``jax.distributed.initialize`` upstream of this helper — the mesh code is
identical either way.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh with named axes, e.g. {'data': 8} or {'data': 4, 'model': 2}.

    Defaults to a 1-axis 'data' mesh over all visible devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axes:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError("mesh %r needs %d devices, have %d"
                         % (axes, int(np.prod(shape)), len(devices)))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh({"data": len(devices)}, devices)

"""Feature store: extracted CNN features + the name<->index contract.

The reference stores features in HDF5 (`att` (N,2048,14,14) / `noatt`
(N,2048)) with a sidecar ``.txt`` listing image names in row order
(``extract.py:100-109,148-150``; reads ``features.py:25-32``).  This module
keeps the same on-disk contract (plus an .npy fast path) and adds the
TPU-native part: ``to_device`` pins the whole matrix in HBM once (678 MB f32
for COCO-train — trivially fits a v5e chip) so training steps gather rows
on-device by index.
"""

from __future__ import annotations

import os

import jax
import numpy as np


class FeatureStore:
    def __init__(self, features: np.ndarray, names: list[str],
                 npy_path: str | None = None):
        assert features.shape[0] == len(names), (features.shape, len(names))
        self.features = features
        self.names = list(names)
        self.name_to_index = {name: i for i, name in enumerate(self.names)}
        self._device_array = None
        self._npy_path = npy_path
        self._native = None

    # -- io -----------------------------------------------------------------
    @classmethod
    def load(cls, path_prefix: str, dataset: str = "noatt") -> "FeatureStore":
        """Load ``{prefix}.hdf5`` (dataset 'att'/'noatt') or ``{prefix}.npy``,
        plus ``{prefix}.txt`` names."""
        names_path = path_prefix + ".txt"
        with open(names_path) as f:
            names = [line.strip() for line in f if line.strip()]
        npy = path_prefix + (".npy" if dataset == "noatt"
                             else ".%s.npy" % dataset)
        if os.path.exists(npy):
            feats = np.load(npy, mmap_mode="r")
            return cls(np.asarray(feats), names, npy_path=npy)
        import h5py
        with h5py.File(path_prefix + ".hdf5", "r") as f:
            feats = np.asarray(f[dataset])
        return cls(np.asarray(feats), names)

    def save(self, path_prefix: str) -> None:
        # atomic replace: live mmaps of a previous file keep their inode
        # (overwriting in place would SIGBUS readers of the old mapping)
        tmp = path_prefix + ".tmp.npy"
        np.save(tmp, np.asarray(self.features))
        os.replace(tmp, path_prefix + ".npy")
        with open(path_prefix + ".txt", "w") as f:
            for name in self.names:
                f.write(name + "\n")

    # -- device -------------------------------------------------------------
    def to_device(self, sharding=None, dtype=None) -> jax.Array:
        """Pin the feature matrix in HBM (optionally sharded/replicated over a
        mesh and/or cast, e.g. bf16 halves the footprint)."""
        if self._device_array is None:
            arr = self.features
            if dtype is not None:
                arr = arr.astype(dtype)
            self._device_array = (jax.device_put(arr, sharding)
                                  if sharding is not None
                                  else jax.device_put(arr))
        return self._device_array

    def gather_rows(self, rows: np.ndarray) -> np.ndarray:
        """Host-side row gather; uses the native C++ mmap/thread-pool store
        (data/native_store.py) when the backing file is a .npy, else numpy.
        This is the fast path for stores too big for HBM (att maps)."""
        if self._native is None and self._npy_path is not None:
            from .native_store import NativeFeatureStore
            try:
                self._native = NativeFeatureStore.open_npy(self._npy_path)
            except Exception as exc:  # noqa: BLE001
                print("native store unavailable (%s); numpy gather" % exc)
                self._npy_path = None
        if self._native is not None:
            flat = self._native.gather(rows)
            return flat.reshape(rows.shape[0], *self._native.row_shape)
        return self.features[rows]

    def get_by_name(self, name: str) -> np.ndarray:
        return self.features[self.name_to_index[name]]

    def __len__(self) -> int:
        return self.features.shape[0]

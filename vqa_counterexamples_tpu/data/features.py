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


class _H5Rows:
    """Lazy row view over an open HDF5 dataset (the reference's per-item read
    pattern, ``features.py:41-42``), with duplicate-tolerant fancy indexing —
    h5py itself requires sorted unique index lists."""

    def __init__(self, path: str, dataset: str):
        import h5py

        self._file = h5py.File(path, "r")
        self._ds = self._file[dataset]
        self.shape = self._ds.shape
        self.dtype = self._ds.dtype

    def __getitem__(self, rows):
        if isinstance(rows, (int, np.integer)):
            return np.asarray(self._ds[int(rows)])
        rows = np.asarray(rows)
        uniq, inverse = np.unique(rows, return_inverse=True)
        data = self._ds[uniq] if len(uniq) > 1 else self._ds[int(uniq[0])][None]
        return data[inverse.reshape(rows.shape)]


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
    def load(cls, path_prefix: str, dataset: str = "noatt",
             lazy: bool | None = None) -> "FeatureStore":
        """Load ``{prefix}.hdf5`` (dataset 'att'/'noatt') or ``{prefix}.npy``,
        plus ``{prefix}.txt`` names.

        ``lazy`` keeps the matrix on disk (npy memory-map or open HDF5
        dataset) instead of materializing it in host RAM; rows stream through
        ``gather_rows``.  Defaults to lazy for att maps (COCO att is ~130 GB
        — far beyond host RAM) and eager for the small noatt matrices.
        """
        if lazy is None:
            lazy = dataset != "noatt"
        names_path = path_prefix + ".txt"
        with open(names_path) as f:
            names = [line.strip() for line in f if line.strip()]
        npy = path_prefix + (".npy" if dataset == "noatt"
                             else ".%s.npy" % dataset)
        if os.path.exists(npy):
            from .native_store import npy_header_bytes
            header, shape, dtype = npy_header_bytes(npy)
            # bf16 matrices are written as a uint16 bit-view (see
            # cli/extract.py --feat-dtype); re-view through a memmap so rows
            # come out bf16 without touching the bytes
            feats = np.memmap(npy, dtype=dtype, mode="r", offset=header,
                              shape=shape)
            if not lazy:
                feats = np.asarray(feats)
            return cls(feats, names, npy_path=npy)
        h5_path = path_prefix + ".hdf5"
        if lazy:
            return cls(_H5Rows(h5_path, dataset), names)
        import h5py
        with h5py.File(h5_path, "r") as f:
            feats = np.asarray(f[dataset])
        return cls(feats, names)

    def save(self, path_prefix: str) -> None:
        # atomic replace: live mmaps of a previous file keep their inode
        # (overwriting in place would SIGBUS readers of the old mapping)
        tmp = path_prefix + ".tmp.npy"
        arr = np.asarray(self.features)
        if arr.dtype.itemsize == 2:  # bf16 rides disk as a uint16 bit-view
            arr = arr.view(np.uint16)
        np.save(tmp, arr)
        os.replace(tmp, path_prefix + ".npy")
        with open(path_prefix + ".txt", "w") as f:
            for name in self.names:
                f.write(name + "\n")

    # -- device -------------------------------------------------------------
    def to_device(self, sharding=None, dtype=None) -> jax.Array:
        """Pin the feature matrix in HBM (optionally sharded/replicated over a
        mesh and/or cast, e.g. bf16 halves the footprint).  Lazy-loaded
        stores are materialized first — only do this for matrices that fit."""
        if self._device_array is None:
            arr = self.features
            if isinstance(arr, _H5Rows):
                arr = arr[np.arange(arr.shape[0])]
            arr = np.asarray(arr)
            if dtype is not None:
                arr = arr.astype(dtype)
            self._device_array = (jax.device_put(arr, sharding)
                                  if sharding is not None
                                  else jax.device_put(arr))
        return self._device_array

    def _native_store(self):
        if self._native is None and self._npy_path is not None:
            from .native_store import NativeFeatureStore
            try:
                self._native = NativeFeatureStore.open_npy(self._npy_path)
            except Exception as exc:  # noqa: BLE001
                print("native store unavailable (%s); numpy gather" % exc)
                self._npy_path = None
        return self._native

    @property
    def row_shape(self) -> tuple:
        return tuple(self.features.shape[1:])

    def gather_rows(self, rows: np.ndarray) -> np.ndarray:
        """Host-side row gather; uses the native C++ mmap/thread-pool store
        (data/native_store.py) when the backing file is a .npy, else numpy.
        This is the fast path for stores too big for HBM (att maps)."""
        native = self._native_store()
        if native is not None:
            flat = native.gather(rows)
            return flat.reshape(rows.shape[0], *native.row_shape)
        return self.features[rows]

    @property
    def dtype(self) -> np.dtype:
        """Element dtype rows come out as (f32, or bf16 when the backing
        file was written with ``extract --feat-dtype bfloat16``)."""
        native = self._native_store()
        if native is not None:
            return native.dtype
        return np.dtype(self.features.dtype)

    def prefetch_rows(self, rows: np.ndarray, out: np.ndarray):
        """Start an async native gather into ``out`` (flat (n, cols), dtype
        ``self.dtype``); returns a ticket for ``wait_rows`` — or None when no
        native store backs this matrix (caller falls back to its own overlap
        strategy)."""
        native = self._native_store()
        if native is None:
            return None
        return native.prefetch(rows, out)

    def wait_rows(self, ticket) -> None:
        self._native.wait(ticket)

    def get_by_name(self, name: str) -> np.ndarray:
        return self.features[self.name_to_index[name]]

    def __len__(self) -> int:
        return self.features.shape[0]

"""Feature extraction CLI (reference ``extract.py``).

Runs a pretrained ResNet-152 over a directory of JPEGs (448x448, ImageNet
normalization) and writes, per split:

* ``{split}set.att.npy`` (C-order float32, or bfloat16 bit-views with
  ``--feat-dtype bfloat16``, written incrementally through a
  memmap) — the att maps (N, 14, 14, 2048) NHWC; this is the layout the
  native C++ mmap store (data/native_store.py) gathers from, so att-mode
  training streams rows without materializing the ~130 GB matrix
  (``--att_store hdf5`` instead writes an ``att`` dataset into the .hdf5
  for strict reference-format parity, ``both`` writes both);
* ``{split}set.hdf5`` with dataset ``noatt`` (N, 2048) — the true spatial
  mean of ``att`` (extract.py:123-124 semantics);
* ``{split}set.npy`` fast-path copy of ``noatt``;
* ``{split}set.txt`` — image names in row order (the name<->index contract,
  extract.py:148-150).

Host pipeline: a thread pool decodes/resizes JPEGs while the TPU runs the
previous batch (double buffering); the model executes in bf16 on the MXU.
"""

from __future__ import annotations

import argparse
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dir_data", default="data/coco", type=str)
    parser.add_argument("--dataset", default="coco", type=str,
                        choices=["coco", "vgenome"],
                        help="coco: raw/{train2014,val2014,test2015}; "
                             "vgenome: raw/images flat dir (reference "
                             "extract.py:56-77, vgenome.py:72-92)")
    parser.add_argument("--data_split", default="train", type=str,
                        choices=["train", "val", "test"])
    parser.add_argument("--arch", default="fbresnet152", type=str)
    parser.add_argument("--mode", default="both", type=str,
                        choices=["att", "noatt", "both"])
    parser.add_argument("--att_store", default="npy", type=str,
                        choices=["npy", "hdf5", "both"],
                        help="att-map container: npy engages the native mmap "
                             "gather path; hdf5 matches the reference format")
    parser.add_argument("--feat-dtype", default="float32", dest="feat_dtype",
                        choices=["float32", "bfloat16"],
                        help="element dtype of the .npy outputs: bfloat16 "
                             "halves disk + host->device bandwidth and keeps "
                             "training features bf16-resident end-to-end "
                             "(the trunk computes in bf16 anyway; .hdf5 "
                             "stays f4 for reference-format parity).  bf16 "
                             "files are written as a uint16 bit-view so "
                             "stock numpy can open them")
    parser.add_argument("--size", default=448, type=int)
    parser.add_argument("-b", "--batch_size", default=80, type=int)
    parser.add_argument("--workers", default=0, type=int,
                        help="decode threads (0 = all host cores; the "
                             "native decoder is GIL-free so it scales "
                             "linearly, unlike the reference's 4 PIL "
                             "worker processes)")
    parser.add_argument("--weights", default=None, type=str,
                        help="torch state_dict .pth to port (else random)")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="extract N random images (smoke mode)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="shard each image batch over a device mesh, "
                             "e.g. 'data=8' (the reference wraps the CNN in "
                             "nn.DataParallel, extract.py:49)")
    from ..parallel import add_distributed_flag
    add_distributed_flag(parser)
    return parser


def main(argv=None, stats=None):
    """``stats``: optional dict filled with per-phase timings (init_s,
    first_batch_s incl. compile+first transfers, steady_img_per_sec,
    finalize_s) so callers can attribute the wall-clock honestly."""
    import jax
    import jax.numpy as jnp

    from ..models import convnets

    args = build_parser().parse_args(argv)
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(args)

    stats = stats if stats is not None else {}
    t_init = time.time()
    model = convnets.factory({"arch": args.arch, "pooling": False})
    params = convnets.init_resnet(model, image_size=args.size)
    if args.weights:
        params = convnets.load_torch_resnet152(params, args.weights)
        print("Ported weights from", args.weights)
    else:
        print("WARNING: no --weights given; extracting with random init "
              "(smoke only)")

    from ..parallel import batch_sharding, mesh_context, mesh_from_spec

    mesh = mesh_from_spec(args.mesh)
    if mesh is not None:
        if args.batch_size % mesh.devices.size != 0:
            raise ValueError("batch_size %d must divide over the %d-device "
                             "mesh" % (args.batch_size, mesh.devices.size))
        params = jax.device_put(
            params, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
        print("=> Mesh %s over %d devices"
              % (dict(zip(mesh.axis_names, mesh.devices.shape)),
                 mesh.devices.size))
    else:
        # normalized upload: torch-ported trees hold transposed leaves,
        # and a non-contiguous leaf device_put as-is costs a per-call
        # relayout (core/policy.device_put_contiguous)
        from ..core.policy import device_put_contiguous

        params = device_put_contiguous(params)

    # params enter as an argument, not a closure: closed-over params become
    # compile-time constants, bloating persistent-cache entries with the
    # full ResNet weights and slowing compilation
    @jax.jit
    def forward(params, batch):
        if batch.dtype == jnp.uint8:
            # images ship uint8 (4x less H2D per batch) and normalize on
            # device; the synthetic path feeds f32 directly
            batch = convnets.normalize_images_device(batch)
        att = model.apply({"params": params}, batch)     # (B, 14, 14, 2048)
        noatt = jnp.mean(att, axis=(1, 2))               # true spatial mean
        return att, noatt

    def run_forward(batch_host):
        """Pad ragged final batches to keep shapes static; shard over the
        mesh when one is configured."""
        n_real = batch_host.shape[0]
        pad = args.batch_size - n_real if mesh is not None else 0
        if pad:
            batch_host = np.concatenate(
                [batch_host, np.zeros((pad,) + batch_host.shape[1:],
                                      batch_host.dtype)])
        arr = jnp.asarray(batch_host)
        if mesh is not None:
            arr = jax.device_put(arr, batch_sharding(mesh))
        with mesh_context(mesh):
            att, noatt = forward(params, arr)
        if pad:
            att, noatt = att[:n_real], noatt[:n_real]
        return att, noatt

    # ---- enumerate inputs ----
    load_batch = None
    if args.synthetic:
        names = ["synthetic_%06d.jpg" % i for i in range(args.synthetic)]
        rng = np.random.default_rng(0)

        def load(name):
            return rng.normal(size=(args.size, args.size, 3)) \
                .astype(np.float32)
    else:
        from PIL import Image

        if args.dataset == "vgenome":
            # VG images sit in one flat raw/images dir, train split only
            # (reference extract.py:66-77, vgenome.py:72-92)
            if args.data_split != "train":
                raise ValueError("train split is required for vgenome")
            img_dir = os.path.join(args.dir_data, "raw", "images")
        else:
            subdir = {"train": "train2014", "val": "val2014",
                      "test": "test2015"}[args.data_split]
            img_dir = os.path.join(args.dir_data, "raw", subdir)
        names = sorted(n for n in os.listdir(img_dir)
                       if n.lower().endswith((".jpg", ".jpeg", ".png")))

        def load(name):
            with Image.open(os.path.join(img_dir, name)) as img:
                # host does Scale+CenterCrop only; ToTensor+Normalize run
                # inside the jitted forward (identical numerics)
                return convnets.preprocess_image_uint8(img.convert("RGB"),
                                                       args.size)

        # GIL-free libjpeg decode pool (native/image_decoder.cpp) — PIL
        # threads cannot scale decode past ~1 core; the native batch call
        # is byte-exact with the PIL path (tests/test_native_decoder.py)
        # and falls back to it per-image for PNG/exotic color spaces
        from ..data.native_decoder import NativeImageDecoder

        native_dec = NativeImageDecoder(n_threads=args.workers or None)
        if native_dec.available:
            def load_batch(batch_names):
                paths = [os.path.join(img_dir, nm) for nm in batch_names]
                out, ok = native_dec.decode_files(paths, size=args.size)
                for i in np.flatnonzero(~ok):
                    out[i] = load(batch_names[i])
                return out

    stats["init_s"] = round(time.time() - t_init, 1)
    n = len(names)
    print("Extracting %d images (%s)" % (n, args.data_split))
    out_dir = os.path.join(args.dir_data, "extract",
                           "arch,%s_size,%d" % (args.arch, args.size))
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(out_dir, "%sset" % args.data_split)

    import h5py

    spatial = args.size // 32
    want_att = args.mode in ("att", "both")
    if args.feat_dtype == "bfloat16":
        import ml_dtypes
        feat_dtype = np.dtype(ml_dtypes.bfloat16)
        disk_dtype = np.dtype(np.uint16)  # bit-view; readers re-view as bf16
    else:
        feat_dtype = disk_dtype = np.dtype(np.float32)
    att_npy_tmp = prefix + ".att.tmp.npy"
    # prefetcher: a DEDICATED single thread runs decode_batch so the image
    # pool below is never deadlocked by its own consumer (decode_batch maps
    # per-image work onto `pool`; submitting it to the same pool would
    # deadlock at max_workers=1)
    with h5py.File(prefix + ".hdf5", "w") as h5, \
            ThreadPoolExecutor(max_workers=1) as prefetcher, \
            ThreadPoolExecutor(
                max_workers=args.workers or os.cpu_count() or 1) as pool:
        ds_att = mm_att = None
        if want_att and args.att_store in ("hdf5", "both"):
            ds_att = h5.create_dataset(
                "att", (n, spatial, spatial, 2048), dtype="f4")
        if want_att and args.att_store in ("npy", "both"):
            mm_att = np.lib.format.open_memmap(
                att_npy_tmp, mode="w+", dtype=disk_dtype,
                shape=(n, spatial, spatial, 2048))
        ds_noatt = h5.create_dataset("noatt", (n, 2048), dtype="f4")

        def decode_batch(start):
            batch_names = names[start:start + args.batch_size]
            if load_batch is not None:
                return load_batch(batch_names)
            return np.stack(list(pool.map(load, batch_names)))

        # double buffering: decode batch i+1 while the device runs batch i
        future = prefetcher.submit(decode_batch, 0)
        t0 = time.time()
        done = 0
        for start in range(0, n, args.batch_size):
            batch = future.result()
            nxt = start + args.batch_size
            if nxt < n:
                future = prefetcher.submit(decode_batch, nxt)
            att, noatt = run_forward(batch)
            end = start + batch.shape[0]
            if ds_att is not None:
                ds_att[start:end] = np.asarray(att, dtype=np.float32)
            if mm_att is not None:
                # bf16 trunk output lands on the host without upcasting —
                # half the device->host traffic and disk bytes
                att_host = np.asarray(att, dtype=feat_dtype)
                mm_att[start:end] = (att_host.view(disk_dtype)
                                     if feat_dtype != disk_dtype
                                     else att_host)
            ds_noatt[start:end] = np.asarray(noatt, dtype=np.float32)
            done = end
            if start == 0:
                # compile + first H2D/D2H land here; steady state follows
                stats["first_batch_s"] = round(time.time() - t0, 1)
                t_steady = time.time()
            if (start // args.batch_size) % 10 == 0:
                rate = done / (time.time() - t0)
                print("  %d/%d (%.1f images/sec)" % (done, n, rate))
        if done > args.batch_size:
            stats["steady_img_per_sec"] = round(
                (done - args.batch_size)
                / max(time.time() - t_steady, 1e-9), 1)
        t_fin = time.time()
        noatt_all = ds_noatt[:]
        if mm_att is not None:
            mm_att.flush()
            del mm_att
    if want_att and args.att_store in ("npy", "both"):
        os.replace(att_npy_tmp, prefix + ".att.npy")
    if feat_dtype != disk_dtype:
        np.save(prefix + ".npy", noatt_all.astype(feat_dtype).view(disk_dtype))
    else:
        np.save(prefix + ".npy", noatt_all)
    with open(prefix + ".txt", "w") as f:
        for name in names:
            f.write(name + "\n")
    stats["finalize_s"] = round(time.time() - t_fin, 1)
    rate = n / (time.time() - t0)
    print("Done: %s.{hdf5,npy,txt} (%.1f images/sec)" % (prefix, rate))
    return prefix


if __name__ == "__main__":
    main()

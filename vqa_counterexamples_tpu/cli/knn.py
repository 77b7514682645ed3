"""kNN builder CLI (reference ``knn.py``).

Fits exact k=25 nearest neighbors over the extracted `noatt` feature matrix
with the brute-force matmul top-k (ops/topk.py) instead of sklearn's CPU
ball-tree — full COCO-train (82,783 x 2048) self-kNN runs in ~20 s on one
v5e chip (exact; ``--approx`` similar at recall 0.9998) — and writes:

* ``knn_results.npy`` — {'indices', 'distances'} (the reference's artifact,
  knn.py:55-58), and
* optionally ``--json-out`` — the VQA-distributed KNN format consumed by the
  dataset builders: {image_id: [24 neighbor image_ids]} (trainset builder
  cell 11).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_features", required=True, type=str,
                        help="prefix of {prefix}.hdf5/.npy + {prefix}.txt")
    parser.add_argument("--dataset", default="noatt", type=str)
    parser.add_argument("-k", "--n_neighbors", default=25, type=int)
    parser.add_argument("-b", "--batch_size", default=1024, type=int)
    parser.add_argument("--engine", default="xla",
                        choices=["xla", "pallas"],
                        help="pallas = fused distance+top-k kernel (no HBM "
                             "distance matrix)")
    parser.add_argument("--approx", action="store_true",
                        help="TPU-native approx_max_k (recall 0.999), much "
                             "faster on large corpora")
    parser.add_argument("--out", default=None, type=str,
                        help="output .npy path (default: alongside features)")
    parser.add_argument("--json-out", default=None, type=str,
                        help="also write VQA-format {image_id: [ids]} json")
    parser.add_argument("--split", default="train",
                        choices=["train", "val"])
    parser.add_argument("--mesh", type=str, default=None,
                        help="shard the corpus rows over a mesh axis, e.g. "
                             "'data=8': local top-k per shard + all-gather "
                             "merge (ops/topk.sharded_knn_chunk)")
    from ..parallel import add_distributed_flag
    add_distributed_flag(parser)
    args = parser.parse_args(argv)
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(args)

    from ..data.features import FeatureStore
    from ..data.vqacx import coco_name_to_num
    from ..ops import topk

    store = FeatureStore.load(args.path_features, dataset=args.dataset)
    print("Loaded %d features of dim %d" % store.features.shape)

    mesh = None
    if args.mesh:
        from ..parallel import mesh_from_spec

        mesh = mesh_from_spec(args.mesh)
        print("=> Mesh %s over %d devices"
              % (dict(zip(mesh.axis_names, mesh.devices.shape)),
                 mesh.devices.size))

    dist, idx = topk.knn(store.features, k=args.n_neighbors,
                         batch_size=args.batch_size, approx=args.approx,
                         engine=args.engine, mesh=mesh)

    out = args.out or (args.path_features + "_knn_results.npy")
    np.save(out, {"indices": idx, "distances": dist})
    print("Saved KNN results to", out)

    if args.json_out:
        table = {}
        for row, name in enumerate(store.names):
            img_id = coco_name_to_num(name)
            # drop self (rank 0) and keep k-1 neighbors as image ids
            neigh = [coco_name_to_num(store.names[j])
                     for j in idx[row] if j != row][:args.n_neighbors - 1]
            table[str(img_id)] = neigh
        with open(args.json_out, "w") as f:
            json.dump(table, f)
        print("Saved VQA-format KNN json to", args.json_out)


if __name__ == "__main__":
    main()

"""Contrastive CX training CLI (reference ``contrastive.py``).

Trains ``ContrastiveModel`` on (orig, comp, random-other) triples with the
Hadsell-Chopra margin loss; eval ranks the 24 candidates by embedding
distance (higher = better counterexample).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_opt",
                        default="configs/cx/counterexamples_default.yaml")
    parser.add_argument("-lr", "--learning_rate", type=float)
    parser.add_argument("-b", "--batch_size", type=int)
    parser.add_argument("--epochs", type=int)
    parser.add_argument("--project_dir", default=".", type=str)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--best", action="store_true")
    parser.add_argument("-c", "--comment", type=str, default="contrastive")
    parser.add_argument("-p", "--print_freq", default=100, type=int)
    parser.add_argument("-v", "--eval_freq", default=-1, type=int)
    group = parser.add_mutually_exclusive_group(required=False)
    group.add_argument("--pretrained_vqa", dest="pretrained_vqa",
                       action="store_true")
    group.add_argument("--untrained_vqa", dest="pretrained_vqa",
                       action="store_false")
    parser.set_defaults(pretrained_vqa=True)
    parser.add_argument("--trainable_vqa", action="store_true")
    parser.add_argument("-dev", "--dev_mode", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--mesh", type=str, default=None,
                        help="data-parallel mesh spec, e.g. 'data=8': shards "
                             "the triple batch over devices (same recipe as "
                             "counterexamples --mesh; VERDICT r3 #7)")
    return parser


def main(argv=None):
    import jax.numpy as jnp
    import optax

    from ..core import checkpoint as ckpt_lib
    from ..core import config as config_lib
    from ..core.experiment import ScalarWriter
    from ..data import vqacx
    from ..engines import contrastive_engine as ce
    from ..engines import cx_engine
    from ..models import factory
    from .counterexamples import load_real_data, load_synthetic_data

    args = build_parser().parse_args(argv)
    args.cx_model = "ContrastiveModel"
    args.test = False
    options = config_lib.resolve_options({}, args.path_opt, {
        "optim": {"lr": args.learning_rate, "batch_size": args.batch_size,
                  "epochs": args.epochs}})

    run_name = args.resume or (
        datetime.now().strftime("%b%d-%H-%M-%S") + "_" + args.comment)
    save_dir = os.path.join(args.project_dir, "logs", "cx", run_name)
    os.makedirs(os.path.join(save_dir, "ckpt"), exist_ok=True)
    os.makedirs(os.path.join(save_dir, "best"), exist_ok=True)
    writer = ScalarWriter(os.path.join(args.project_dir, "runs", run_name))

    print("=> Loading data...")
    if args.synthetic:
        trainset, valset, _, f_train, f_val = load_synthetic_data(
            args, args.synthetic)
    else:
        trainset, valset, _, f_train, f_val = load_real_data(options, args)
    train_arrays = vqacx.CXArrays.from_examples(trainset["examples_list"],
                                                f_train.name_to_index)
    val_arrays = vqacx.CXArrays.from_examples(valset["examples_list"],
                                              f_val.name_to_index)
    features_train = f_train.to_device()
    features_val = f_val.to_device()

    print("=> Building model...")
    vqa_model = factory.factory_vqa(options["model"],
                                    trainset["vocab_words"],
                                    trainset["vocab_answers"])
    model = factory.factory_cx("ContrastiveModel", vqa_model, knn_size=2,
                               trainable_vqa=args.trainable_vqa)
    optimizer = optax.adam(options["optim"]["lr"])

    batch_size = options["optim"]["batch_size"]
    rng = np.random.default_rng(args.seed)
    init_batch = vqacx.gather_batch(
        train_arrays.pairwise_view(rng),
        np.arange(min(batch_size, train_arrays.size)))
    state_cx = cx_engine.init_cx_state(model, optimizer, init_batch,
                                       features_train, seed=args.seed)
    state = ce.ContrastiveState(state_cx.params, state_cx.opt_state,
                                state_cx.step)

    info, start_epoch, best_recall = [], 1, 0.0
    if args.resume:
        state, info, start_epoch, best_recall = \
            ckpt_lib.load_cx_checkpoint(state, save_dir,
                                        resume_best=args.best)

    # frozen-backbone caches (identical numerics; see cx_engine
    # precompute_q_emb/precompute_v_proj): the pairwise triples keep
    # row i = example i, so the q table indexes by example_idxs as usual
    use_cache = not args.trainable_vqa
    q_train = q_val = v_train = v_val = None
    if use_cache:
        try:
            print("=> Precomputing frozen-backbone q_emb/v_proj caches...")
            q_train = cx_engine.precompute_q_emb(model, state.params,
                                                 train_arrays.question_wids)
            q_val = cx_engine.precompute_q_emb(model, state.params,
                                               val_arrays.question_wids)
            v_train = cx_engine.precompute_v_proj(model, state.params,
                                                  features_train)
            v_val = (v_train if features_val is features_train
                     else cx_engine.precompute_v_proj(model, state.params,
                                                      features_val))
        except AssertionError as exc:  # per-rank dropout/activation configs
            print("=> caches unavailable (%s); disabled" % exc)
            use_cache = False
            q_train = q_val = v_train = v_val = None
    # ---- optional data-parallel mesh (same recipe as counterexamples) ----
    mesh = None
    from ..parallel import parse_mesh

    axes = parse_mesh(args.mesh)
    if axes:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh

        n_dev = 1
        for size in axes.values():
            n_dev *= size
        if batch_size % axes.get("data", 1) != 0:
            raise ValueError("batch_size %d must divide over data=%d"
                             % (batch_size, axes.get("data", 1)))
        mesh = make_mesh(axes, jax.devices()[:n_dev])
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        # test aliasing BEFORE rebinding: comparing against the freshly
        # device_put array would never match and would upload (and hold)
        # the shared table twice
        features_aliased = features_val is features_train
        features_train = jax.device_put(features_train, repl)
        features_val = (features_train if features_aliased
                        else jax.device_put(features_val, repl))
        if q_train is not None:
            q_train = jax.device_put(q_train, repl)
            q_val = jax.device_put(q_val, repl)
        if v_train is not None:
            v_aliased = v_val is v_train
            v_train = jax.device_put(v_train, repl)
            v_val = (v_train if v_aliased
                     else jax.device_put(v_val, repl))
        print("=> Mesh %s over %d devices" % (axes, n_dev))

    train_step = ce.make_contrastive_train_step(model, optimizer,
                                                base_seed=args.seed,
                                                use_q_cache=use_cache,
                                                use_v_cache=use_cache)
    eval_step = ce.make_contrastive_eval_step(model, use_q_cache=use_cache,
                                              use_v_cache=use_cache)

    def shard(batch):
        if mesh is None:
            return batch
        from ..parallel import shard_batch

        return shard_batch(batch, mesh)

    def mesh_ctx():
        import contextlib

        import jax

        return (jax.set_mesh(mesh) if mesh is not None
                else contextlib.nullcontext())

    def run_eval():
        from ..core import policy

        # AUTO-layout trained params need default layouts for the plain
        # eval jit (policy.dispatch_safe; no-op when AUTO is off)
        params = policy.dispatch_safe(state.params)
        totals, n = {"correct": 0.0}, 0
        step = 0
        for idx, n_valid in vqacx.batch_indices(val_arrays.size, batch_size,
                                                shuffle=False):
            with mesh_ctx():
                out = eval_step(params, features_val,
                                shard(vqacx.gather_batch(val_arrays, idx)),
                                jnp.asarray(n_valid, jnp.float32),
                                jnp.asarray(step, jnp.int32), q_val, v_val)
            totals["correct"] += float(out["correct"])
            n += n_valid
            step += 1
        return {"contrastive/recall": totals["correct"] / n,
                "recall": totals["correct"] / n}

    print("=> Starting training...")
    for epoch in range(start_epoch, options["optim"]["epochs"] + 1):
        pw = train_arrays.pairwise_view(rng)
        b = 0
        for idx, n_valid in vqacx.batch_indices(pw.size, batch_size,
                                                shuffle=True, rng=rng):
            batch = shard(vqacx.gather_batch(pw, idx))
            with mesh_ctx():
                state, m = train_step(state, features_train, batch,
                                      jnp.asarray(n_valid, jnp.float32),
                                      q_train, v_train)
            b += 1
            if b % args.print_freq == 0:
                metrics = {k: float(v) for k, v in m.items()}
                for k, v in metrics.items():
                    writer.add_scalar("contrastive/" + k, v, state.step)
                print("Epoch {} train: {}".format(
                    epoch, {k: round(v, 4) for k, v in metrics.items()}))
            if args.eval_freq > 0 and b % args.eval_freq == 0:
                mid = run_eval()
                print("Epoch {} eval@{}: {}".format(
                    epoch, b,
                    {k: round(float(v), 4) for k, v in mid.items()}))
        eval_results = run_eval()
        print("Epoch {} val: {}".format(
            epoch,
            {k: round(float(v), 4) for k, v in eval_results.items()}))
        info.append({k: float(v) for k, v in eval_results.items()})
        is_best = eval_results["contrastive/recall"] > best_recall
        if is_best:
            best_recall = eval_results["contrastive/recall"]
        ckpt_lib.save_cx_checkpoint(state, info, save_dir, is_best=is_best)
    writer.close()
    return info


if __name__ == "__main__":
    main()

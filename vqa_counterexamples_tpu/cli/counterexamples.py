"""CX training/eval CLI — the main entry point.

Mirrors the reference driver (``counterexamples.py:39-389``): same flags
(--cx_model, --epochs, --test, --viz, --pairwise, --pretrained_vqa/
--untrained_vqa, --trainable_vqa, --sb_lambda, --dev_mode, --resume/--best,
--path_opt, lr/bs overrides), same run-dir layout (logs/cx/<run>/{ckpt,best}),
same metrics.  Additional ``--synthetic N`` flag runs the full pipeline on
generated data (no COCO required) — the smoke path.

Usage:
    python -m vqa_counterexamples_tpu.cli.counterexamples \
        --cx_model NeuralModel --epochs 20 [--test] [--synthetic 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
from datetime import datetime

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_opt",
                        default="configs/cx/counterexamples_default.yaml",
                        type=str, help="path to a yaml options file")
    parser.add_argument("-cx", "--cx_model", required=True, type=str,
                        help="Counterexample model type")
    parser.add_argument("-lr", "--learning_rate", type=float,
                        help="initial learning rate")
    parser.add_argument("-lb", "--sb_lambda", type=float,
                        help="semantic baseline lambda")
    parser.add_argument("-b", "--batch_size", type=int, help="mini-batch size")
    parser.add_argument("--epochs", type=int,
                        help="number of total epochs to run")
    parser.add_argument("--project_dir", default=".", type=str,
                        help="path to project root whose data to use")
    parser.add_argument("--resume", default="", type=str,
                        help="run name to resume")
    parser.add_argument("--best", action="store_true",
                        help="whether to resume best checkpoint")
    parser.add_argument("-c", "--comment", type=str, default="")
    parser.add_argument("-p", "--print_freq", default=100, type=int)
    parser.add_argument("-v", "--eval_freq", default=-1, type=int)
    parser.add_argument("-t", "--test", action="store_true",
                        help="Run eval on full testset after training")
    parser.add_argument("--viz", action="store_true",
                        help="Run viz on valset after training")
    parser.add_argument("--pairwise", action="store_true",
                        help="Pairwise training")
    group = parser.add_mutually_exclusive_group(required=False)
    group.add_argument("--pretrained_vqa", dest="pretrained_vqa",
                       action="store_true")
    group.add_argument("--untrained_vqa", dest="pretrained_vqa",
                       action="store_false")
    parser.set_defaults(pretrained_vqa=True)
    parser.add_argument("--trainable_vqa", action="store_true",
                        help="If true, backprop through VQA model")
    parser.add_argument("-dev", "--dev_mode", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="run on N synthetic examples instead of COCO")
    parser.add_argument("--no_q_cache", action="store_true",
                        help="disable the precomputed frozen-encoder q_emb "
                             "cache (identical numerics; cache only skips "
                             "recomputing the frozen GRU every step)")
    parser.add_argument("--z_cache", action="store_true",
                        help="precompute the full fused embedding z per "
                             "(example, candidate) — the q/v caching logic "
                             "taken to its conclusion; replaces the in-step "
                             "fusion with one row gather (identical "
                             "numerics, tests/test_z_cache.py).  Opt-in: "
                             "the table is ~7.7 GB f32 at VQA2-CX train "
                             "scale; needs a frozen backbone, non-pairwise")
    parser.add_argument("--scan_steps", type=int, default=0,
                        help="run N train steps per device dispatch via "
                             "lax.scan (identical numerics, "
                             "tests/test_cx_scan.py); amortizes dispatch "
                             "latency — +2%% on a tunneled v5e at N=50, "
                             "more on higher-latency runtimes.  0 = one "
                             "dispatch per step; ignored under --mesh")
    parser.add_argument("--no_v_cache", action="store_true",
                        help="disable the precomputed per-image fusion "
                             "v-projection cache (numerically equivalent — "
                             "last-ulp GEMM-shape differences only, see "
                             "tests/test_v_cache.py; skips the frozen "
                             "fusion v-side GEMMs every step)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="data-parallel mesh spec, e.g. 'data=8': shards "
                             "the batch over devices, replicates params "
                             "(gradient all-reduce over ICI)")
    from ..parallel import add_distributed_flag
    add_distributed_flag(parser)
    parser.add_argument("--init_params", type=str, default=None,
                        help="msgpack params file to graft over the "
                             "initialized CX params (e.g. a reference torch "
                             "checkpoint converted by cli/port_checkpoint "
                             "--kind cx); applied before --resume")
    parser.add_argument("--seed", type=int, default=42)
    return parser


def parse_mesh(spec: str | None):
    """'data=8' or 'data=4,model=2' -> axes dict."""
    from ..parallel import parse_mesh as _parse

    return _parse(spec)


def load_real_data(options, args):
    """Pickled augmented sets + KNN json + HDF5 features
    (reference counterexamples.py:178-207)."""
    from ..data import vqacx
    from ..data.features import FeatureStore

    # the augmented pickles live in <path_trainset>/pickle/ (the reference
    # uses a pickle_old/ subdir, counterexamples.py:185) or directly in
    # path_trainset (cli/build_vqacx --out_dir)
    root = options["vqa"]["path_trainset"]
    base = os.path.join(root, "pickle")
    if not os.path.isdir(base):
        base = root
    train_name = ("trainset_augmented_small.pickle" if args.dev_mode
                  else "trainset_augmented.pickle")
    trainset = vqacx.load_dataset(os.path.join(base, train_name))
    valset = vqacx.load_dataset(
        os.path.join(base, "valset_augmented_small.pickle"))
    testset = None
    if args.test:
        testset = vqacx.load_dataset(
            os.path.join(base, "valset_augmented.pickle"))

    feats = options["coco"]["path_features"]
    features_train = FeatureStore.load(os.path.join(feats, "trainset"))
    features_val = FeatureStore.load(os.path.join(feats, "valset"))
    return trainset, valset, testset, features_train, features_val


def load_synthetic_data(args, n_examples):
    from ..data import synthetic

    trainset, store = synthetic.make_synthetic_cx(
        n_examples=n_examples, n_images=max(128, n_examples // 4),
        dim_v=2048, knn_size=24, n_answers=100, seed=args.seed, split="train")
    valset, val_store = synthetic.make_synthetic_cx(
        n_examples=max(n_examples // 4, 64),
        n_images=max(128, n_examples // 8), dim_v=2048, knn_size=24,
        n_answers=100, seed=args.seed + 1, split="val")
    # synthetic shares one answer/word vocab
    valset["vocab_words"] = trainset["vocab_words"]
    valset["vocab_answers"] = trainset["vocab_answers"]
    return trainset, valset, valset, store, val_store


def main(argv=None):
    import jax.numpy as jnp
    import optax

    from ..core import checkpoint as ckpt_lib
    from ..core import config as config_lib
    from ..core.experiment import ScalarWriter
    from ..data import vqacx
    from ..engines import cx_engine
    from ..models import factory
    from ..models.cx import init_answer_embedding

    args = build_parser().parse_args(argv)
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(args)

    # ---- options (CLI non-None > YAML > defaults; reference :100-114) ----
    cli_overrides = {
        "optim": {"lr": args.learning_rate, "batch_size": args.batch_size,
                  "epochs": args.epochs},
        "cx_model": {"pretrained_vqa": args.pretrained_vqa,
                     "trainable_vqa": args.trainable_vqa},
    }
    options = config_lib.resolve_options({}, args.path_opt, cli_overrides)
    options["vgenome"] = None

    random.seed(args.seed)
    np.random.seed(args.seed)

    # ---- run-dir bookkeeping (reference :126-172) ----
    if args.cx_model == "NeuralModel" and not args.comment:
        args.comment = options["cx_model"]["name"]
    if args.resume:
        run_name = args.resume
        save_dir = os.path.join(args.project_dir, "logs", "cx", run_name)
        assert os.path.isdir(save_dir), save_dir
    else:
        run_name = datetime.now().strftime("%b%d-%H-%M-%S")
        if args.comment:
            run_name += "_" + args.comment
        save_dir = os.path.join(args.project_dir, "logs", "cx", run_name)
        os.makedirs(os.path.join(save_dir, "ckpt"), exist_ok=True)
        os.makedirs(os.path.join(save_dir, "best"), exist_ok=True)
    log_dir = os.path.join(args.project_dir, "runs", run_name)
    train_writer = ScalarWriter(os.path.join(log_dir, "train"))
    val_writer = ScalarWriter(os.path.join(log_dir, "val"))
    config_lib.save_options(options, save_dir)
    print("Saving model to {}".format(save_dir))

    # ---- data ----
    print("=> Loading VQA-CX dataset...")
    if args.synthetic:
        trainset, valset, testset, f_train, f_val = load_synthetic_data(
            args, args.synthetic)
    else:
        trainset, valset, testset, f_train, f_val = load_real_data(
            options, args)

    train_arrays = vqacx.CXArrays.from_examples(trainset["examples_list"],
                                                f_train.name_to_index)
    val_arrays = vqacx.CXArrays.from_examples(valset["examples_list"],
                                              f_val.name_to_index)
    features_train = f_train.to_device()
    features_val = f_val.to_device()

    # ---- model (reference :212-278) ----
    print("=> Building model...")
    vqa_model = None
    optimizer = None
    extra_args = ()
    knn_size = train_arrays.knn_size
    trainable_vqa = options["cx_model"]["trainable_vqa"]

    if args.cx_model in ("RandomBaseline", "DistanceBaseline"):
        cx_model = factory.factory_cx(args.cx_model, None, knn_size=knn_size)
    else:
        vqa_model = factory.factory_vqa(options["model"],
                                        trainset["vocab_words"],
                                        trainset["vocab_answers"])
        model_spec = dict(options["cx_model"])
        if args.cx_model == "SemanticBaseline":
            if args.sb_lambda is None:
                raise ValueError("SemanticBaseline requires --sb_lambda")
            cx_model = factory.factory_cx(
                "SemanticBaseline", vqa_model, knn_size=knn_size,
                trainable_vqa=trainable_vqa, sb_lambda=args.sb_lambda)
            emb = _load_answer_embedding(options, args,
                                         len(trainset["vocab_answers"]))
            emb = np.asarray(emb, np.float32)
            norm = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                              1e-8)
            extra_args = (jnp.asarray((emb / norm) @ (emb / norm).T),)
        else:
            cx_model = factory.factory_cx(
                args.cx_model, vqa_model, knn_size=knn_size,
                trainable_vqa=trainable_vqa, model_spec=model_spec)
        if args.cx_model in ("NeuralModel", "LinearContext", "PairwiseModel",
                             "PairwiseLinearModel"):
            optimizer = optax.adam(options["optim"]["lr"])
    print("Built {}".format(args.cx_model))

    # ---- init state ----
    batch_size = options["optim"]["batch_size"]
    example_idx = np.arange(min(batch_size, train_arrays.size))
    init_view = (train_arrays.pairwise_view(np.random.default_rng(0))
                 if args.pairwise else train_arrays)
    state = cx_engine.init_cx_state(
        cx_model, optimizer, vqacx.gather_batch(init_view, example_idx),
        features_train, seed=args.seed, extra_apply_args=extra_args)

    # pretrained pieces grafted into the params tree
    if vqa_model is not None and options["cx_model"].get("pretrained_vqa") \
            and not args.synthetic:
        state = _load_pretrained_vqa(state, options, args)
    if (args.cx_model == "NeuralModel"
            and options["cx_model"].get("pretrained_emb")
            and not args.synthetic):
        emb = _load_answer_embedding(options, args,
                                     len(trainset["vocab_answers"]))
        params = dict(state.params)
        params = init_answer_embedding(params, emb)
        state = state._replace(params=params)

    if args.init_params:
        # ported params (cli/port_checkpoint --kind cx): deserialize against
        # the initialized tree so structure/shapes are validated, then graft
        state = state._replace(params=ckpt_lib.load_pytree(
            state.params, args.init_params))
        print("Initialized CX params from {}".format(args.init_params))

    info = []
    start_epoch = 1
    best_recall = 0.0
    if args.resume:
        state, info, start_epoch, best_recall = ckpt_lib.load_cx_checkpoint(
            state, save_dir, resume_best=args.best)

    # ---- loop-invariant encoder cache (frozen VQA only) ----
    # q_emb is a constant of training when the backbone is frozen
    # (reference cx.py:59-60 runs it in eval mode); hoist the 26-step GRU
    # out of the step.  Bitwise-identical numerics (tests/test_q_cache.py).
    q_train = q_val = None
    use_q_cache = (vqa_model is not None and not trainable_vqa
                   and not args.no_q_cache)
    if use_q_cache:
        print("=> Precomputing frozen-encoder q_emb cache...")
        q_train = cx_engine.precompute_q_emb(cx_model, state.params,
                                             train_arrays.question_wids)
        q_val = cx_engine.precompute_q_emb(cx_model, state.params,
                                           val_arrays.question_wids)

    # v-side twin: the per-image fusion projection is also a training
    # constant under a frozen backbone (tests/test_v_cache.py); one table
    # per feature store.  Indexed by image, so pairwise views are fine.
    v_train = v_val = None
    use_v_cache = (vqa_model is not None and not trainable_vqa
                   and not args.no_v_cache)
    if use_v_cache:
        try:
            print("=> Precomputing per-image fusion v-projection cache...")
            v_train = cx_engine.precompute_v_proj(cx_model, state.params,
                                                  features_train)
            v_val = (v_train if features_val is features_train
                     else cx_engine.precompute_v_proj(cx_model, state.params,
                                                      features_val))
        except AssertionError as exc:  # per-rank dropout/activation configs
            print("=> v-projection cache unavailable (%s); disabled" % exc)
            use_v_cache = False
            v_train = v_val = None

    # one level further (opt-in): the whole fused embedding per
    # (example, candidate) is a training constant too — the in-step fusion
    # collapses to a row gather (tests/test_z_cache.py)
    z_train = z_val = None
    use_z_cache = (args.z_cache and use_q_cache and use_v_cache
                   and not args.pairwise)
    if args.z_cache and not use_z_cache:
        print("=> z-emb cache needs a frozen backbone with q+v caches and "
              "a non-pairwise run; disabled")
    if use_z_cache:
        print("=> Precomputing per-example fused-embedding z cache...")
        z_train = cx_engine.precompute_z_emb(
            cx_model, state.params, features_train, train_arrays.image_idxs,
            q_train, v_table=v_train)
        z_val = cx_engine.precompute_z_emb(
            cx_model, state.params, features_val, val_arrays.image_idxs,
            q_val, v_table=v_val)

    # ---- optional data-parallel mesh (the TPU-native nn.DataParallel) ----
    mesh = None
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
        if "model" in axes and axes["model"] > 1:
            # row-shard the feature corpus over the 'model' axis: each
            # device holds N/P rows and GSPMD turns the in-step gather into
            # collectives over ICI, so corpora larger than one chip's HBM
            # still train (requires N % model == 0; pad upstream otherwise)
            corpus_sh = NamedSharding(mesh, P("model", None))

            def _row_shard(feats):
                import numpy as _np
                feats = _np.asarray(feats)
                pad = -feats.shape[0] % axes["model"]
                if pad:  # padded rows are never indexed by any example
                    feats = _np.concatenate(
                        [feats, _np.zeros((pad, feats.shape[1]),
                                          feats.dtype)])
                return jax.device_put(feats, corpus_sh)

            features_train = _row_shard(features_train)
            features_val = _row_shard(features_val)
            # the v-projection table rows align with feature rows — shard it
            # the same way so its gather rides the same collectives
            if v_train is not None:
                v_train = _row_shard(v_train)
                v_val = _row_shard(v_val)
            print("=> Feature corpus row-sharded over model=%d"
                  % axes["model"])
        else:
            features_train = jax.device_put(features_train, repl)
            features_val = jax.device_put(features_val, repl)
            if v_train is not None:
                v_train = jax.device_put(v_train, repl)
                v_val = jax.device_put(v_val, repl)
        if q_train is not None:
            q_train = jax.device_put(q_train, repl)
            q_val = jax.device_put(q_val, repl)
        if z_train is not None:
            z_train = jax.device_put(z_train, repl)
            z_val = jax.device_put(z_val, repl)
        print("=> Mesh %s over %d devices" % (axes, n_dev))

    # ---- engines ----
    train_step = (cx_engine.make_cx_train_step(
        cx_model, optimizer, recall_k=1 if args.pairwise else 5,
        base_seed=args.seed, extra_apply_args=extra_args,
        use_q_cache=use_q_cache, use_v_cache=use_v_cache,
        use_z_cache=use_z_cache)
        if optimizer is not None else None)
    scan_step = None
    if (train_step is not None and args.scan_steps > 1 and mesh is None):
        scan_step = cx_engine.make_cx_train_scan(
            cx_model, optimizer, recall_k=1 if args.pairwise else 5,
            base_seed=args.seed, extra_apply_args=extra_args,
            use_q_cache=use_q_cache, use_v_cache=use_v_cache,
            use_z_cache=use_z_cache)
        print("=> Scanned trainer: %d steps per dispatch" % args.scan_steps)
    eval_step = cx_engine.make_cx_eval_step(cx_model, recall_k=5,
                                            extra_apply_args=extra_args,
                                            use_q_cache=use_q_cache,
                                            use_v_cache=use_v_cache,
                                            use_z_cache=use_z_cache)

    def run_eval(st):
        return cx_engine.eval_model(
            eval_step, st.params, features_val, val_arrays, batch_size,
            pairwise=args.pairwise, pairwise_eval_step=eval_step,
            rng=np.random.default_rng(123), mesh=mesh, q_table=q_val,
            v_table=v_val, z_table=z_val)

    # ---- train loop (reference :293-371) ----
    print("=> Starting training...")
    if args.pairwise:
        print("==> Pairwise training")
    rng = np.random.default_rng(args.seed)
    eval_results = None
    epoch = None
    for epoch in range(start_epoch, options["optim"]["epochs"] + 1):
        if train_step is not None:
            def log_fn(b, metrics, _epoch=epoch):
                step = (_epoch - 1) * 10000 + b
                for k, v in metrics.items():
                    train_writer.add_scalar(k, v, step)
                print("Epoch {} train: {}".format(
                    _epoch, {k: round(v, 4) for k, v in metrics.items()}))

            state, eval_results = cx_engine.train_epoch(
                train_step, state, features_train, train_arrays, batch_size,
                pairwise=args.pairwise, rng=rng, log_fn=log_fn,
                print_freq=args.print_freq,
                eval_fn=run_eval, eval_freq=args.eval_freq, mesh=mesh,
                q_table=q_train, v_table=v_train, z_table=z_train,
                scan_step=scan_step, scan_len=args.scan_steps)
        else:
            eval_results = run_eval(state)
        for k, v in eval_results.items():
            val_writer.add_scalar(k, v, epoch)
        print("Epoch {} val: {}".format(
            epoch, {k: round(float(v), 4) for k, v in eval_results.items()}))

        info.append({k: float(v) for k, v in eval_results.items()})
        is_best = info[-1]["recall"] > best_recall
        if is_best:
            best_recall = info[-1]["recall"]
        ckpt_lib.save_cx_checkpoint(state, info, save_dir, is_best=is_best)
        print("{}Saved checkpoint to {}".format("* " if is_best else "",
                                                save_dir))

    # ---- final test (reference :373-386) ----
    if args.test or args.viz:
        if epoch is not None and optimizer is not None:
            state, _, best_epoch, _ = ckpt_lib.load_cx_checkpoint(
                state, save_dir, resume_best=True)
        else:
            best_epoch = 0
    if args.test:
        test_arrays = vqacx.CXArrays.from_examples(
            testset["examples_list"], f_val.name_to_index)
        q_test = (cx_engine.precompute_q_emb(cx_model, state.params,
                                             test_arrays.question_wids)
                  if use_q_cache else None)
        z_test = (cx_engine.precompute_z_emb(
            cx_model, state.params, features_val, test_arrays.image_idxs,
            q_test, v_table=v_val) if use_z_cache else None)
        test_results = cx_engine.eval_model(
            eval_step, state.params, features_val, test_arrays, batch_size,
            pairwise=args.pairwise, pairwise_eval_step=eval_step,
            rng=np.random.default_rng(123), mesh=mesh, q_table=q_test,
            v_table=v_val, z_table=z_test)
        test_results = {k: float(v) for k, v in test_results.items()}
        test_results["best_epoch"] = best_epoch
        with open(os.path.join(save_dir, "final_results.txt"), "w") as f:
            f.write(json.dumps(test_results))
        print("FINAL RESULTS ON BEST EPOCH {}".format(best_epoch),
              test_results)
    if args.viz:
        from ..viz import grids
        viz_dir = os.path.join(args.project_dir, "viz", "cx", run_name)
        os.makedirs(viz_dir, exist_ok=True)
        grids.visualize_results(
            cx_model, state, valset, val_arrays, features_val, eval_step,
            num_images=min(200, val_arrays.size),
            datadir=options["coco"].get("path_val_raw"), viz_dir=viz_dir,
            extra_apply_args=extra_args)
    train_writer.close()
    val_writer.close()
    return info


def _load_pretrained_vqa(state, options, args):
    """Graft a pretrained VQA checkpoint under the cx params' vqa_model key
    (reference counterexamples.py:226-228 -> train.py:332)."""
    from ..core import checkpoint as ckpt_lib

    path = os.path.join(options["logs"]["dir_logs"], "best")
    params = dict(state.params)
    if "vqa_model" not in params:
        print("Warning: cx model has no vqa_model params to load into")
        return state
    _, vqa_params, _ = ckpt_lib.load_vqa_checkpoint(params["vqa_model"], None,
                                                    path)
    if vqa_params is not None:
        params["vqa_model"] = vqa_params
        state = state._replace(params=params)
        print("Loaded pretrained VQA model from {}".format(path))
    return state


def _load_answer_embedding(options, args, n_answers):
    if args.synthetic:
        return np.random.default_rng(0).normal(
            size=(n_answers, 2400)).astype(np.float32)
    path = os.path.join(options["vqa"]["path_trainset"],
                        "answer_embedding.pickle")
    with open(path, "rb") as f:
        return pickle.load(f)


if __name__ == "__main__":
    main()

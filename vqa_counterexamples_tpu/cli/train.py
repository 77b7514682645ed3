"""VQA pretraining CLI (reference ``train.py``).

Trains MUTAN/MLB VQA classifiers on VQA/VQA2 processed data; per-epoch
validation with acc@1/acc@5 + OpenEnded result rows; checkpoint policy with
best-tracking (or keep-all-from-epoch); Experiment JSON logging.

Usage:
    python -m vqa_counterexamples_tpu.cli.train \
        --path_opt configs/vqa2/mutan_noatt_train.yaml [--synthetic N]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    from ..core.config import str2bool

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_opt",
                        default="configs/vqa2/mutan_noatt_train.yaml")
    parser.add_argument("--dir_logs", type=str, help="dir logs override")
    parser.add_argument("-lr", "--learning_rate", type=float)
    parser.add_argument("-b", "--batch_size", type=int)
    parser.add_argument("--epochs", type=int)
    parser.add_argument("--start_epoch", default=1, type=int)
    parser.add_argument("--resume", default="", type=str,
                        help="best | ckpt (resume from dir_logs)")
    parser.add_argument("--save_model", default=True, type=str2bool)
    parser.add_argument("--save_all_from", type=int,
                        help="keep all checkpoints from this epoch on")
    parser.add_argument("-e", "--evaluate", action="store_true",
                        help="evaluate only")
    parser.add_argument("-p", "--print_freq", default=10, type=int)
    parser.add_argument("--synthetic", type=int, default=0, metavar="N")
    parser.add_argument("--mesh", type=str, default=None,
                        help="data-parallel mesh spec, e.g. 'data=8': shards "
                             "each batch over devices, replicates params "
                             "(gradient all-reduce over ICI)")
    parser.add_argument("--seed", type=int, default=42)
    from ..parallel import add_distributed_flag
    add_distributed_flag(parser)
    return parser


def _synthetic_vqa(n, options, seed):
    """Synthetic processed-like examples + features for smoke runs."""
    from ..data import synthetic
    from ..data.features import FeatureStore

    rng = np.random.default_rng(seed)
    nans = min(options["vqa"]["nans"], 50)
    maxlength = options["vqa"]["maxlength"]
    n_words = 80
    n_images = max(64, n // 4)
    model_opt = options["model"]
    arch = model_opt.get("arch", "")
    # att archs consume the spatial (14, 14, C) feature map; dim_v lives at
    # the model level in att configs (reference options/vqa2/mutan_att_*)
    is_att = arch.endswith("Att") and not arch.endswith("NoAtt")
    dim_v = model_opt.get("dim_v") or model_opt["fusion"]["dim_v"]
    shape = (n_images, 14, 14, dim_v) if is_att else (n_images, dim_v)
    feats = rng.normal(size=shape).astype(np.float32)
    names = ["COCO_train2014_%012d.jpg" % i for i in range(n_images)]
    store = FeatureStore(feats, names)
    vocab_words, vocab_answers = synthetic.synthetic_vocab(n_words, nans)
    examples = []
    for i in range(n):
        qlen = int(rng.integers(3, 10))
        wids = [0] * maxlength
        for k in range(qlen):
            wids[k] = int(rng.integers(1, n_words + 1))
        aid = int(rng.integers(0, nans))
        examples.append({
            "question_id": i, "image_name": names[int(rng.integers(0, n_images))],
            "question_wids": wids, "answer_aid": aid,
            "answers_aid": [aid], "answers_count": [10],
        })
    return examples, store, vocab_words, vocab_answers


def main(argv=None):
    import optax

    from ..core import checkpoint as ckpt_lib
    from ..core import config as config_lib
    from ..core.experiment import Experiment
    from ..core.meters import AvgMeter, SumMeter, ValueMeter
    from ..data.vqa_dataset import VQAArrays
    from ..engines import vqa_engine
    from ..models import factory

    args = build_parser().parse_args(argv)
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    options = config_lib.resolve_options({}, args.path_opt, {
        "logs": {"dir_logs": args.dir_logs},
        "optim": {"lr": args.learning_rate, "batch_size": args.batch_size,
                  "epochs": args.epochs},
    })
    dir_logs = options["logs"]["dir_logs"]
    os.makedirs(dir_logs, exist_ok=True)
    config_lib.save_options(options, dir_logs)

    # ---- data ----
    print("=> Loading dataset...")
    if args.synthetic:
        train_ex, store, vocab_words, vocab_answers = _synthetic_vqa(
            args.synthetic, options, args.seed)
        val_ex, val_store = train_ex, store
    else:
        import pickle
        from ..core.config import options_subdir
        from ..data.features import FeatureStore

        processed = os.path.join(options["vqa"]["dir"], "processed",
                                 options_subdir(options["vqa"]))
        split = ("trainvalset"
                 if options["vqa"]["trainsplit"] == "trainval"
                 else "trainset")
        with open(os.path.join(processed, split + ".pickle"), "rb") as f:
            train_ex = pickle.load(f)
        with open(os.path.join(processed, "valset.pickle"), "rb") as f:
            val_ex = pickle.load(f)
        with open(os.path.join(processed, "wid_to_word.pickle"), "rb") as f:
            wid_to_word = pickle.load(f)
        vocab_words = [wid_to_word[i] for i in sorted(wid_to_word)]
        with open(os.path.join(processed, "aid_to_ans.pickle"), "rb") as f:
            vocab_answers = pickle.load(f)
        feats_dir = os.path.join(
            options["coco"]["dir"], "extract",
            "arch,%s_size,%d" % (options["coco"]["arch"],
                                 options["coco"].get("size", 448)))
        store = FeatureStore.load(os.path.join(feats_dir, "trainset"),
                                  dataset=options["coco"]["mode"])
        val_store = FeatureStore.load(os.path.join(feats_dir, "valset"),
                                      dataset=options["coco"]["mode"])

    train_arrays = VQAArrays(train_ex, store,
                             samplingans=options["vqa"].get("samplingans",
                                                            False))
    val_arrays = VQAArrays(val_ex, val_store, samplingans=False)
    noatt = options["coco"]["mode"] == "noatt"
    device_features = store.to_device() if noatt else None
    val_device_features = val_store.to_device() if noatt else None

    # trainval training has no held-out val: each epoch emits test2015 +
    # test-dev2015 submission rows instead (reference train.py:130-133,
    # 241-262, engine.py:117-153)
    test_arrays = test_device_features = None
    if options["vqa"]["trainsplit"] == "trainval":
        if args.synthetic:
            test_ex = []
            for ex in train_ex:
                ex = {k: v for k, v in ex.items()
                      if k not in ("answer_aid", "answers_aid",
                                   "answers_count")}
                test_ex.append(ex)
            test_arrays = VQAArrays(test_ex, store)
            test_arrays.is_qid_testdev = {
                ex["question_id"] for ex in test_ex[:len(test_ex) // 2]}
            test_device_features = device_features
        else:
            from ..data import factory as data_factory
            test_arrays, _, _, test_store = data_factory.factory_vqa_dataset(
                "test", options["vqa"], options["coco"])
            test_device_features = test_store.to_device() if noatt else None

    # ---- model/optim ----
    print("=> Building model...")
    model = factory.factory_vqa(options["model"], vocab_words, vocab_answers)
    optimizer = optax.adam(options["optim"]["lr"])
    rng = np.random.default_rng(args.seed)
    example = next(train_arrays.batches(
        min(options["optim"]["batch_size"], train_arrays.size),
        shuffle=False, device_features=device_features))
    state = vqa_engine.init_vqa_state(model, optimizer, example,
                                      seed=args.seed)

    # ---- pretrained skip-thoughts init (reference seq2vec.py:80-85: the
    # external package loads dir_st weights at construction).  The adapted
    # npz is produced by cli/port_skipthoughts from the raw Cadene
    # artifacts; when the configured dir_st holds one, graft it over the
    # random seq2vec init.  Absent file = train from scratch (the
    # --untrained_vqa-style path), exactly as before. ----
    seq_opt = options["model"].get("seq2vec", {})
    if seq_opt.get("arch") == "skipthoughts" and not args.resume:
        from ..models.seq2vec import load_skipthoughts_npz

        # an unset/empty dir_st must NOT fall back to a bare relative
        # filename — that would silently graft whatever stray
        # adapted_uniskip.npz happens to sit in the caller's CWD
        dir_st = seq_opt.get("dir_st", "")
        st_npz = seq_opt.get(
            "weights",
            os.path.join(dir_st, "adapted_uniskip.npz") if dir_st else "")
        if st_npz and os.path.exists(st_npz):
            params = dict(state.params)
            params["seq2vec"] = load_skipthoughts_npz(
                dict(params["seq2vec"]), st_npz)
            state = state._replace(params=params)
            print("=> seq2vec initialized from %s" % st_npz)

    # ---- optional data-parallel mesh ----
    mesh = None
    if args.mesh:
        import jax

        from ..parallel import mesh_from_spec, replicated

        mesh = mesh_from_spec(args.mesh)
        if options["optim"]["batch_size"] % mesh.devices.size != 0:
            raise ValueError("batch_size %d must divide over the %d-device "
                             "mesh" % (options["optim"]["batch_size"],
                                       mesh.devices.size))
        repl = replicated(mesh)
        state = jax.device_put(state, repl)
        if device_features is not None:
            device_features = jax.device_put(device_features, repl)
        if val_device_features is not None:
            val_device_features = jax.device_put(val_device_features, repl)
        if test_device_features is not None:
            test_device_features = jax.device_put(test_device_features, repl)
        print("=> Mesh %s over %d devices"
              % (dict(zip(mesh.axis_names, mesh.devices.shape)),
                 mesh.devices.size))

    exp = Experiment(os.path.basename(dir_logs), options=dict(options))
    meter_set = lambda: {"loss": AvgMeter(), "acc1": AvgMeter(),
                         "acc5": AvgMeter(), "batch_time": AvgMeter(),
                         "data_time": AvgMeter(), "epoch_time": SumMeter(),
                         "best_epoch": ValueMeter(), "best_acc1": ValueMeter()}
    exp.add_meters("train", meter_set())
    exp.add_meters("val", meter_set())

    best_acc1 = 0.0
    start_epoch = args.start_epoch
    if args.resume:
        sub = "best" if args.resume == "best" else ""
        info, model_state, optim_state = ckpt_lib.load_vqa_checkpoint(
            state.params, state.opt_state, os.path.join(dir_logs, sub)
            if sub else dir_logs)
        if model_state is not None:
            state = state._replace(params=model_state)
        if optim_state is not None:
            state = state._replace(opt_state=optim_state)
        start_epoch = int(info.get("epoch", 0)) + 1
        best_acc1 = float(info.get("best_acc1", 0.0))

    train_step = vqa_engine.make_vqa_train_step(model, optimizer,
                                                base_seed=args.seed)
    eval_step = vqa_engine.make_vqa_eval_step(model)

    def val_loader():
        return val_arrays.batches(options["optim"]["batch_size"],
                                  shuffle=False, drop_remainder=True,
                                  device_features=val_device_features)

    def run_test_pass(epoch):
        """OpenEnded submission rows for test2015 + the test-dev subset
        (no ground truth; reference engine.test)."""
        predict = vqa_engine.make_vqa_predict_step(model)
        loader = test_arrays.batches(options["optim"]["batch_size"],
                                     shuffle=False,
                                     device_features=test_device_features)
        rows = vqa_engine.test_pass(predict, state.params, loader,
                                    vocab_answers)
        qids = getattr(test_arrays, "is_qid_testdev", None) or set()
        testdev_rows = [r for r in rows if r["question_id"] in qids]
        _save_results(rows, epoch, dir_logs, "test2015")
        _save_results(testdev_rows, epoch, dir_logs, "test-dev2015")
        print("Epoch %d test: %d rows (%d test-dev)"
              % (epoch, len(rows), len(testdev_rows)))
        return rows, testdev_rows

    if args.evaluate:
        if test_arrays is not None:
            return run_test_pass(start_epoch - 1)
        res, rows = vqa_engine.validate(eval_step, state.params, val_loader(),
                                        exp, 0, aid_to_ans=vocab_answers,
                                        collect_results=True)
        print("Evaluate:", res)
        _save_results(rows, 0, dir_logs, "val",
                      dir_vqa=options["vqa"].get("dir"))
        return res

    # ---- epochs ----
    for epoch in range(start_epoch, options["optim"]["epochs"] + 1):
        def train_loader():
            return train_arrays.batches(
                options["optim"]["batch_size"], shuffle=True, rng=rng,
                drop_remainder=True, device_features=device_features)

        state = vqa_engine.train_epoch(train_step, state, train_loader(),
                                       exp, epoch,
                                       print_freq=args.print_freq,
                                       mesh=mesh)
        if test_arrays is not None:
            # trainval: no val metrics — checkpoint every epoch and emit
            # submission rows (reference train.py:241-262)
            run_test_pass(epoch)
            exp.to_json(os.path.join(dir_logs, "logger.json"))
            ckpt_lib.save_vqa_checkpoint(
                {"epoch": epoch, "best_acc1": best_acc1},
                state.params, state.opt_state, dir_logs,
                save_model=args.save_model,
                save_all_from=args.save_all_from, is_best=False)
            continue
        res, rows = vqa_engine.validate(eval_step, state.params, val_loader(),
                                        exp, epoch,
                                        aid_to_ans=vocab_answers,
                                        collect_results=True, mesh=mesh)
        print("Epoch {} val: {}".format(epoch, res))

        is_best = res["acc1"] > best_acc1
        best_acc1 = max(res["acc1"], best_acc1)
        exp.get_meter("val", "best_epoch").update(
            epoch if is_best else exp.get_meter("val", "best_epoch").value())
        exp.get_meter("val", "best_acc1").update(best_acc1)
        exp.to_json(os.path.join(dir_logs, "logger.json"))
        ckpt_lib.save_vqa_checkpoint(
            {"epoch": epoch, "best_acc1": best_acc1,
             "acc1": res["acc1"], "acc5": res["acc5"]},
            state.params, state.opt_state, dir_logs,
            save_model=args.save_model, save_all_from=args.save_all_from,
            is_best=is_best)
        _save_results(rows, epoch, dir_logs, "val",
                      dir_vqa=options["vqa"].get("dir"))
    return state


def _save_results(rows, epoch, dir_logs, split, dir_vqa=None):
    """OpenEnded result rows (reference train.py:276-288); when the official
    annotations are on disk, scoring runs asynchronously on a thread — the
    in-repo equivalent of the reference's ``os.system('python2 eval_res.py
    ... &')`` spawn (train.py:287-288)."""
    results_dir = os.path.join(dir_logs, "results", split)
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir,
                        "vqa_OpenEnded_mscoco_epoch_%d.json" % epoch)
    with open(path, "w") as f:
        json.dump(rows, f)
    if dir_vqa and split == "val":
        ann = os.path.join(dir_vqa, "raw", "annotations",
                           "v2_mscoco_val2014_annotations.json")
        if os.path.exists(ann):
            import threading

            from . import eval_res

            t = threading.Thread(
                target=eval_res.main,
                args=(["--path_results", path, "--path_annotations", ann],),
                daemon=False)
            t.start()
            return t
    return None


if __name__ == "__main__":
    main()

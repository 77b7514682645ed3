"""VQA pretraining engine (reference ``train.py`` + ``vqa/lib/engine.py``).

Jitted train/validate steps for the MUTAN/MLB classifiers: CE loss over the
2000-answer head, acc@1/acc@5 meters, optional answer sampling happens on the
host loader side (``samplingans``, reference ``vqa/datasets/vqa.py:62-76``).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import policy
from ..core import rng as rng_lib
from ..ops.metrics import accuracy_topk, cross_entropy_mean


class VQATrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_vqa_state(model, optimizer, example_batch: dict,
                   seed: int = 42) -> VQATrainState:
    # init on at most 8 rows: param shapes/values are batch-independent and
    # the full-batch init compile is minutes through the remote compile
    # service (see cx_engine.init_cx_state); slice BEFORE any conversion so
    # an att-mode device-resident visual never round-trips whole
    rows = min(8, len(example_batch["question"]))
    visual = np.asarray(example_batch["visual"][:rows])
    question = np.asarray(example_batch["question"][:rows])
    with policy.host_init_scope():  # eager CPU init (see cx_engine)
        key = jax.random.key(seed)
        k_param, k_drop = jax.random.split(key)
        variables = model.init({"params": k_param, "dropout": k_drop},
                               jnp.asarray(visual), jnp.asarray(question),
                               deterministic=True)
    # no explicit device: committed params change jit dispatch keys and
    # force downstream recompiles (see cx_engine.init_cx_state)
    from ..core.policy import device_put_contiguous
    params = device_put_contiguous(variables["params"])
    opt_state = optimizer.init(params) if optimizer is not None else None
    return VQATrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_vqa_train_step(model, optimizer, base_seed: int = 42) -> Callable:
    root = rng_lib.root_key(base_seed)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       **policy.auto_layout_jit_kwargs(1))
    def train_step(state: VQATrainState, batch):
        keys = rng_lib.step_keys(root, state.step, ("dropout",))

        def loss_fn(params):
            output = model.apply({"params": params}, batch["visual"],
                                 batch["question"], deterministic=False,
                                 rngs=keys)
            return cross_entropy_mean(output, batch["answer"]), output

        (loss, output), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc1, acc5 = accuracy_topk(output, batch["answer"], topk=(1, 5))
        return (VQATrainState(new_params, new_opt_state, state.step + 1),
                {"loss": loss, "acc1": acc1, "acc5": acc5})

    return train_step


def make_vqa_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(params, batch):
        output = model.apply({"params": params}, batch["visual"],
                             batch["question"], deterministic=True)
        loss = cross_entropy_mean(output, batch["answer"])
        acc1, acc5 = accuracy_topk(output, batch["answer"], topk=(1, 5))
        return {"loss": loss, "acc1": acc1, "acc5": acc5,
                "pred": jnp.argmax(output, axis=-1)}

    return eval_step


def _maybe_shard(batch, mesh):
    if mesh is None:
        return batch
    from ..parallel import shard_batch

    return shard_batch(batch, mesh)


def train_epoch(train_step, state, loader, experiment, epoch: int,
                print_freq: int = 10, mesh=None):
    """Epoch driver with the reference's meter set (engine.py:6-56).

    With ``mesh``, each batch is sharded over the 'data' axis before the
    step (params replicated -> XLA all-reduces grads over ICI; the
    TPU-native ``nn.DataParallel``, reference train.py:139-141)."""
    from ..parallel import mesh_context

    meters = experiment.reset_meters("train")
    end = time.time()
    for i, batch in enumerate(loader):
        batch_size = batch["answer"].shape[0]
        meters["data_time"].update(time.time() - end, n=batch_size)
        with mesh_context(mesh):
            state, m = train_step(state, _maybe_shard(batch, mesh))
        meters["loss"].update(float(m["loss"]), n=batch_size)
        meters["acc1"].update(float(m["acc1"]), n=batch_size)
        meters["acc5"].update(float(m["acc5"]), n=batch_size)
        meters["batch_time"].update(time.time() - end, n=batch_size)
        end = time.time()
        if i % print_freq == 0:
            print("Epoch: [{0}][{1}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                  "Loss {loss.val:.4f} ({loss.avg:.4f})\t"
                  "Acc@1 {acc1.val:.3f} ({acc1.avg:.3f})\t"
                  "Acc@5 {acc5.val:.3f} ({acc5.avg:.3f})".format(
                      epoch, i, bt=meters["batch_time"],
                      loss=meters["loss"], acc1=meters["acc1"],
                      acc5=meters["acc5"]))
    experiment.log_meters("train", n=epoch)
    return state


def validate(eval_step, params, loader, experiment, epoch: int,
             aid_to_ans=None, collect_results: bool = False, mesh=None):
    """Validation pass; optionally collects OpenEnded-style result rows
    [{question_id, answer}] (reference engine.py:65-114)."""
    from ..parallel import mesh_context

    # the AUTO-layout train step leaves params in XLA-chosen layouts that
    # the plain-jit eval step's dispatch would mismatch at runtime; one
    # host round-trip per validate restores default layouts (no-op when
    # AUTO is off — see policy.dispatch_safe)
    params = policy.dispatch_safe(params)
    meters = experiment.reset_meters("val")
    results = []
    for batch in loader:
        batch_size = batch["answer"].shape[0]
        with mesh_context(mesh):
            m = eval_step(params, _maybe_shard(batch, mesh))
        meters["loss"].update(float(m["loss"]), n=batch_size)
        meters["acc1"].update(float(m["acc1"]), n=batch_size)
        meters["acc5"].update(float(m["acc5"]), n=batch_size)
        if collect_results and aid_to_ans is not None:
            import numpy as np
            preds = np.asarray(m["pred"])
            for qid, aid in zip(batch["question_id"], preds):
                results.append({"question_id": int(qid),
                                "answer": aid_to_ans[int(aid)]})
    experiment.log_meters("val", n=epoch)
    out = {"acc1": meters["acc1"].value(), "acc5": meters["acc5"].value(),
           "loss": meters["loss"].value()}
    return (out, results) if collect_results else out


def test_pass(eval_step_logits, params, loader, aid_to_ans,
              testdev: bool = False):
    """Answer-only pass over test/test-dev (no ground truth; reference
    engine.py:117-153): returns OpenEnded result rows for submission."""
    import numpy as np

    params = policy.dispatch_safe(params)  # see validate
    results = []
    for batch in loader:
        preds = np.asarray(eval_step_logits(params, batch))
        for qid, aid in zip(batch["question_id"], preds):
            results.append({"question_id": int(qid),
                            "answer": aid_to_ans[int(aid)]})
    return results


def make_vqa_predict_step(model) -> Callable:
    """argmax answer ids only (for test_pass)."""
    @jax.jit
    def predict(params, batch):
        output = model.apply({"params": params}, batch["visual"],
                             batch["question"], deterministic=True)
        return jnp.argmax(output, axis=-1)

    return predict

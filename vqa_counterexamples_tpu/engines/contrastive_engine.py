"""Contrastive CX training (reference ``contrastive.py``).

Train on (orig, comp, random-other) triples: the comp embedding is pushed
*away* from the original (label=1 in the Hadsell-Chopra loss) and the random
other pulled toward it (label=0) — at eval, larger Euclidean distance = better
counterexample (contrastive.py:217-219, 259-290; loss :293-309).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core import policy
from ..core import rng as rng_lib
from ..ops.metrics import pairwise_distance, recall_at_k
from .cx_engine import cache_kwargs, frozen_param_keys, split_params


def contrastive_loss(out1: jax.Array, out2: jax.Array, label: jax.Array,
                     margin: float = 2.0) -> jax.Array:
    """mean((1-label)*d^2 + label*max(margin-d, 0)^2)."""
    d = pairwise_distance(out1, out2, keepdims=False)
    same = (1.0 - label) * d ** 2
    diff = label * jnp.maximum(margin - d, 0.0) ** 2
    return jnp.mean(same + diff)


class ContrastiveState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_contrastive_train_step(model, optimizer, *, margin: float = 2.0,
                                base_seed: int = 42,
                                use_q_cache: bool = False,
                                use_v_cache: bool = False) -> Callable:
    root = rng_lib.root_key(base_seed)
    frozen_keys = frozen_param_keys(model)
    if ((use_q_cache or use_v_cache)
            and getattr(model, "trainable_vqa", False)):
        raise ValueError("q_emb/v_proj caches require a frozen VQA backbone")

    # 6-arg jit + thin wrapper: in_shardings (the AUTO-layout path,
    # core/policy.auto_layout_jit_kwargs) must match the positional arity.
    # AUTO is opt-in here like the CX step (default_on=False): the
    # trainable subtree is a small embedding head over a frozen backbone —
    # the configuration where AUTO measured layout-neutral — and the state
    # feeds a plain-jit eval step (see policy.dispatch_safe)
    @functools.partial(jax.jit, donate_argnums=(0,),
                       **policy.auto_layout_jit_kwargs(5, default_on=False))
    def _step(state: ContrastiveState, features, batch, n_valid,
              q_table, v_table):
        keys = rng_lib.step_keys(root, state.step, ("dropout", "lesion"))
        batch_size = batch["comp_idxs"].shape[0]
        mask = jnp.arange(batch_size) < n_valid
        trainable, frozen = split_params(state.params, frozen_keys)
        cache_kw = cache_kwargs(batch, q_table, v_table)

        def loss_fn(trainable):
            params = {**trainable, **frozen}
            image_features = jnp.take(features, batch["image_idxs"], axis=0)
            h = model.apply({"params": params}, image_features,
                            batch["question_wids"], batch["answer_aids"],
                            deterministic=False, rngs=keys, **cache_kw)
            # triple layout from pairwise_view: 0=orig, 1=comp, 2=other
            w = mask.astype(jnp.float32)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            d_comp = pairwise_distance(h[:, 0], h[:, 1], keepdims=False)
            d_other = pairwise_distance(h[:, 0], h[:, 2], keepdims=False)
            loss_comp = jnp.sum(
                w * jnp.maximum(margin - d_comp, 0.0) ** 2) / wsum
            loss_other = jnp.sum(w * d_other ** 2) / wsum
            return loss_comp + loss_other, (loss_comp, loss_other,
                                            d_comp, d_other)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  trainable)
        new_params = {**optax.apply_updates(trainable, updates), **frozen}
        loss_comp, loss_other, d_comp, d_other = aux
        new_state = ContrastiveState(new_params, new_opt_state,
                                     state.step + 1)
        return new_state, {
            "loss": loss, "loss_comp": loss_comp, "loss_other": loss_other,
            "dist_comp": jnp.mean(d_comp), "dist_other": jnp.mean(d_other)}

    def train_step(state: ContrastiveState, features, batch, n_valid,
                   q_table=None, v_table=None):
        return _step(state, features, batch, n_valid, q_table, v_table)

    return train_step


def make_contrastive_eval_step(model, *, recall_k: int = 5,
                               base_seed: int = 123,
                               use_q_cache: bool = False,
                               use_v_cache: bool = False) -> Callable:
    """24-way eval: rank candidates by embedding distance from the original
    (contrastive.py:259-290)."""
    root = rng_lib.root_key(base_seed)

    @jax.jit
    def eval_step(params, features, batch, n_valid, step, q_table=None,
                  v_table=None):
        keys = rng_lib.step_keys(root, step, ("lesion",))
        batch_size = batch["comp_idxs"].shape[0]
        mask = jnp.arange(batch_size) < n_valid
        cache_kw = cache_kwargs(batch, q_table, v_table)
        image_features = jnp.take(features, batch["image_idxs"], axis=0)
        h = model.apply({"params": params}, image_features,
                        batch["question_wids"], batch["answer_aids"],
                        deterministic=True, rngs=keys, **cache_kw)
        scores = pairwise_distance(h[:, :1], h[:, 1:], keepdims=False)
        hits = recall_at_k(scores, batch["comp_idxs"], k=recall_k)
        return {"correct": jnp.sum(hits * mask),
                "loss_sum": jnp.zeros(()),
                "correct1": jnp.sum(
                    recall_at_k(scores, batch["comp_idxs"], k=1) * mask)}

    return eval_step

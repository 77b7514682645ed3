"""Metrics: recall@K over candidate rankings, top-k accuracy, CE loss.

Jit-friendly replacements for the reference's GPU->CPU roundtrips
(``counterexamples.py:501-506`` recallAtK, ``vqa/lib/utils.py:23-38`` accuracy).
All return device arrays; reductions stay on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def recall_at_k(scores: jax.Array, ground_truth: jax.Array,
                k: int = 5) -> jax.Array:
    """Per-example 0/1: is the ground-truth index within the top-k scores?

    scores (B, C); ground_truth (B,) int.  Matches reference recallAtK
    (counterexamples.py:501-506) which sums top-k membership per row.
    """
    _, top_idx = jax.lax.top_k(scores, k)
    hit = jnp.any(top_idx == ground_truth[:, None], axis=1)
    return hit.astype(jnp.float32)


def accuracy_topk(output: jax.Array, target: jax.Array,
                  topk=(1,)) -> list[jax.Array]:
    """Precision@k in percent (reference utils.py:23-38).

    ``target`` may be (B,) class ids or (B, C) scores (multians: argmax used).
    """
    # clamp k to the class count: with C < k classes every class is in the
    # top-C, so precision@k == precision@C (tiny-vocab smoke configs)
    n_classes = output.shape[-1]
    maxk = min(max(topk), n_classes)
    batch_size = target.shape[0]
    if target.ndim == 2:
        target = jnp.argmax(target, axis=1)
    _, pred = jax.lax.top_k(output, maxk)  # (B, maxk)
    correct = pred == target[:, None]
    return [jnp.sum(correct[:, :min(k, n_classes)]).astype(jnp.float32)
            * (100.0 / batch_size)
            for k in topk]


def cross_entropy_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Summed (not averaged) softmax cross-entropy, matching the reference
    ``nn.CrossEntropyLoss(size_average=False)`` (counterexamples.py:310)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.sum(nll)


def cross_entropy_mean(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return cross_entropy_sum(logits, labels) / logits.shape[0]


def pairwise_distance(a: jax.Array, b: jax.Array, eps: float = 1e-6,
                      keepdims: bool = True) -> jax.Array:
    """Euclidean distance along the last axis (torch F.pairwise_distance
    semantics: adds eps inside the norm)."""
    d = jnp.sqrt(jnp.sum((a - b + eps) ** 2, axis=-1))
    return d[..., None] if keepdims else d


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8,
                      axis: int = -1) -> jax.Array:
    na = jnp.sqrt(jnp.sum(a * a, axis=axis))
    nb = jnp.sqrt(jnp.sum(b * b, axis=axis))
    return jnp.sum(a * b, axis=axis) / jnp.maximum(na * nb, eps)

"""Qualitative visualization grids (reference ``cx_visu.py`` + the --viz path
of ``counterexamples.py:393-448``).

``viz_knns``: original image + its 24 candidates tiled, ground-truth
complement framed in green.  ``viz_qa``: original/comp/top-5 candidates with
the VQA model's top-3 answer distributions.  Requires matplotlib + PIL and a
directory of raw COCO jpegs; silently skips examples with missing images
(the reference wraps each grid in try/except, counterexamples.py:440-446).
"""

from __future__ import annotations

import os

import numpy as np


def _load_image(datadir: str, name: str):
    from PIL import Image

    return Image.open(os.path.join(datadir, name)).convert("RGB")


def viz_knns(datadir, img_name, knns, comp, question, answer, knn_size,
             outfile=None):
    """Original + KNN tile grid; green border marks the complement
    (reference cx_visu.py:23-78)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = 5
    rows = 1 + (knn_size + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    fig.suptitle("Q: {}   A: {}".format(question, answer), fontsize=12)
    for ax in axes.flat:
        ax.axis("off")
    axes.flat[0].imshow(_load_image(datadir, img_name))
    axes.flat[0].set_title("original", fontsize=9)
    for i, name in enumerate(knns[:knn_size]):
        ax = axes.flat[cols + i]
        ax.imshow(_load_image(datadir, name))
        ax.set_title("#%d" % (i + 1), fontsize=8)
        if name == comp:
            for spine in ax.spines.values():
                spine.set_edgecolor("green")
                spine.set_linewidth(4)
            ax.axis("on")
            ax.set_xticks([])
            ax.set_yticks([])
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=60)
        plt.close(fig)
    return fig


def viz_qa(datadir, img_name, knns, comp, question, answer, comp_answer,
           answer_dists, top_k, outfile=None):
    """Original/comp/top-k candidates with top-3 answer strings
    (reference cx_visu.py:81-134)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 2 + top_k
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 4))
    for ax in axes:
        ax.axis("off")
    axes[0].imshow(_load_image(datadir, img_name))
    axes[0].set_title("orig\nA: {}".format(answer), fontsize=8)
    axes[1].imshow(_load_image(datadir, comp))
    axes[1].set_title("comp\nA: {}".format(comp_answer), fontsize=8)
    for i in range(top_k):
        axes[2 + i].imshow(_load_image(datadir, knns[i]))
        if answer_dists and i < len(answer_dists):
            label = "\n".join("%s %.2f" % (w, s)
                              for w, s in answer_dists[i])
        else:
            label = "#%d" % (i + 1)
        axes[2 + i].set_title(label, fontsize=7)
    fig.suptitle("Q: {}".format(question), fontsize=11)
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=60)
        plt.close(fig)
    return fig


def visualize_results(cx_model, state, valset, val_arrays, feature_store,
                      eval_step, num_images, datadir, viz_dir,
                      extra_apply_args=()):
    """Score the first num_images val examples and render both grids per
    example (reference counterexamples.py:393-448)."""
    import jax
    import jax.numpy as jnp

    from ..core import rng as rng_lib
    from ..data import vqacx

    if datadir is None or not os.path.isdir(str(datadir)):
        print("viz: no raw image directory available (%r); skipping grids"
              % (datadir,))
        return

    idx = np.arange(min(num_images, val_arrays.size))
    batch = vqacx.gather_batch(val_arrays, idx)
    features = feature_store.to_device()
    image_features = jnp.take(features, jnp.asarray(batch["image_idxs"]),
                              axis=0)
    keys = rng_lib.step_keys(rng_lib.root_key(0), 0, ("lesion",))
    scores = cx_model.apply(
        {"params": state.params}, image_features,
        jnp.asarray(batch["question_wids"]),
        jnp.asarray(batch["answer_aids"]), *extra_apply_args,
        deterministic=True, rngs=keys)
    # answer distributions over candidates for the label strips
    a_knns = None
    if hasattr(cx_model, "vqa_forward") and "vqa_model" in state.params:
        _, _, a_knns, _, _ = cx_model.apply(
            {"params": state.params}, image_features,
            jnp.asarray(batch["question_wids"]), deterministic=True,
            rngs=keys, method=cx_model.vqa_forward)
        a_knns = np.asarray(jax.nn.softmax(a_knns, axis=-1))
    scores = np.asarray(scores)

    vocab_answers = valset["vocab_answers"]
    for i in idx:
        ex = valset["examples_list"][i]
        order = np.argsort(-scores[i])
        knns_sorted = [ex["knns"][j] for j in order]
        dists = None
        if a_knns is not None:
            dists = []
            for j in order[:5]:
                top3 = np.argsort(-a_knns[i, j])[:3]
                dists.append([(vocab_answers[t], float(a_knns[i, j, t]))
                              for t in top3])
        try:
            viz_knns(datadir, ex["image_name"], knns_sorted,
                     ex["comp"]["image_name"], ex["question"], ex["answer"],
                     len(ex["knns"]),
                     outfile=os.path.join(viz_dir,
                                          "viz_knns_%d.jpg" % i))
            viz_qa(datadir, ex["image_name"], knns_sorted,
                   ex["comp"]["image_name"], ex["question"], ex["answer"],
                   ex["comp"]["answer"], dists, 5,
                   outfile=os.path.join(viz_dir, "viz_qa%d.jpg" % i))
        except Exception as exc:  # reference swallows per-example viz errors
            print("viz: skipped example %d (%s)" % (i, exc))
    print("Saved visualizations to", viz_dir)

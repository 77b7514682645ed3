"""CX model zoo: shape/behavior tests for all 9 scorers + lesions + VQA models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_counterexamples_tpu.data import synthetic
from vqa_counterexamples_tpu.models import factory
from vqa_counterexamples_tpu.models.cx import ContrastiveModel

B, KNN, DV, NANS = 3, 6, 24, 10


@pytest.fixture(scope="module")
def vqa_model():
    opt = synthetic.tiny_vqa_options(dim_v=DV, nans=NANS)
    words, answers = synthetic.synthetic_vocab(20, NANS)
    return factory.factory_vqa(opt, words, answers)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    image_features = jnp.asarray(
        rng.normal(size=(B, KNN + 1, DV)), jnp.float32)
    wids = jnp.asarray(rng.integers(0, 15, size=(B, 26)), jnp.int32)
    aids = jnp.asarray(rng.integers(0, NANS, size=(B,)), jnp.int32)
    return image_features, wids, aids


def _init_and_apply(model, inputs, extra=()):
    image_features, wids, aids = inputs
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lesion": jax.random.key(2)}
    variables = model.init(rngs, image_features, wids, aids, *extra,
                           deterministic=True)
    out = model.apply(variables, image_features, wids, aids, *extra,
                      deterministic=True,
                      rngs={"lesion": jax.random.key(3)})
    return variables, out


def default_spec(**kw):
    spec = dict(dim_h=16, n_layers=2, drop_p=0.25, v_emb=True, v_mult=True,
                v_dist=True, v_rank=True, q_emb=True, a_emb=True, z_emb=True,
                pretrained_emb=False, trainable_vqa=False)
    spec.update(kw)
    return spec


@pytest.mark.parametrize("name", ["RandomBaseline", "DistanceBaseline"])
def test_baselines_shape(name, inputs, vqa_model):
    model = factory.factory_cx(name, None, knn_size=KNN)
    _, out = _init_and_apply(model, inputs)
    assert out.shape == (B, KNN)


def test_distance_baseline_values(inputs):
    model = factory.factory_cx("DistanceBaseline", None, knn_size=KNN)
    _, out = _init_and_apply(model, inputs)
    # scores are reversed rank order (reference cx.py:40-44)
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.arange(KNN - 1, -1, -1))


@pytest.mark.parametrize("name", ["BlackBox", "LinearContext",
                                  "PairwiseLinearModel", "SimilarityModel"])
def test_vqa_backed_models_shape(name, inputs, vqa_model):
    model = factory.factory_cx(name, vqa_model, knn_size=KNN)
    _, out = _init_and_apply(model, inputs)
    assert out.shape == (B, KNN)


def test_pairwise_model_both_knn_sizes(inputs, vqa_model):
    """Same params serve K=2 training and K=24 eval (reference mutates
    knn_size, counterexamples.py:461-471)."""
    image_features, wids, aids = inputs
    model = factory.factory_cx("PairwiseModel", vqa_model, knn_size=2)
    variables, out = _init_and_apply(model, inputs)
    assert out.shape == (B, KNN)
    pair_feats = image_features[:, :3]
    out2 = model.apply(variables, pair_feats, wids, aids, deterministic=True,
                       rngs={"lesion": jax.random.key(0)})
    assert out2.shape == (B, 2)
    assert bool(jnp.all(out2 >= 0))  # relu-ed scores (cx.py:370)


def test_semantic_baseline(inputs, vqa_model):
    model = factory.factory_cx("SemanticBaseline", vqa_model, knn_size=KNN,
                               sb_lambda=0.5)
    emb_pairs = jnp.eye(NANS)
    _, out = _init_and_apply(model, inputs, extra=(emb_pairs,))
    assert out.shape == (B, KNN)
    # softmax output: rows sum to 1 (reference cx.py:206-208)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), np.ones(B),
                               rtol=1e-5)


def test_contrastive_model(inputs, vqa_model):
    model = factory.factory_cx("ContrastiveModel", vqa_model, knn_size=KNN)
    _, h = _init_and_apply(model, inputs)
    assert h.shape == (B, KNN + 1, 300)
    scores = ContrastiveModel.get_scores(h[:, 0], h[:, 1:])
    assert scores.shape == (B, KNN)
    assert bool(jnp.all(scores >= 0))


def test_neural_model_full_spec(inputs, vqa_model):
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=default_spec())
    variables, out = _init_and_apply(model, inputs)
    assert out.shape == (B, KNN)
    # deterministic + full spec => no lesion randomness: repeatable
    image_features, wids, aids = inputs
    out2 = model.apply(variables, image_features, wids, aids,
                       deterministic=True,
                       rngs={"lesion": jax.random.key(99)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("lesion", ["v_emb", "v_mult", "v_dist", "v_rank",
                                    "a_emb", "z_emb"])
def test_neural_model_lesions(lesion, inputs, vqa_model):
    spec = default_spec(**{lesion: False})
    if lesion == "z_emb":
        spec["q_emb"] = False  # reference lesion pairing (see cx.py:270-277)
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=spec)
    _, out = _init_and_apply(model, inputs)
    assert out.shape == (B, KNN)
    assert np.isfinite(np.asarray(out)).all()


def test_neural_model_lesioned_feature_has_no_gradient(inputs, vqa_model):
    """v_mult=False zeroes that block: grads of w1 rows for v_mult must be 0
    for the *feature* path (the rows still exist in the fused weight)."""
    from vqa_counterexamples_tpu.ops.scorer import FeatureSlices

    image_features, wids, aids = inputs
    model = factory.factory_cx("NeuralModel", vqa_model, knn_size=KNN,
                               model_spec=default_spec(v_mult=False))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lesion": jax.random.key(2)}
    variables = model.init(rngs, image_features, wids, aids,
                           deterministic=True)

    def loss(params):
        out = model.apply({"params": params}, image_features, wids, aids,
                          deterministic=True,
                          rngs={"lesion": jax.random.key(3)})
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    sl = FeatureSlices(dim_v=DV, dim_q=48, dim_z=24, dim_a=2400, knn_size=KNN)
    lo, hi = sl.offsets()["v_mult"]
    g_mult = np.asarray(grads["linear_1_w"][lo:hi])
    assert np.abs(g_mult).max() == 0.0


def test_vqa_noatt_forward(vqa_model):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(B, DV)), jnp.float32)
    q = jnp.asarray(rng.integers(0, 15, size=(B, 26)), jnp.int32)
    variables = vqa_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, v, q,
        deterministic=True)
    out = vqa_model.apply(variables, v, q, deterministic=True)
    assert out.shape == (B, NANS)


@pytest.mark.parametrize("arch", ["MLBAtt", "MutanAtt"])
def test_vqa_att_forward(arch):
    words, answers = synthetic.synthetic_vocab(20, NANS)
    opt = {
        "arch": arch,
        "dim_v": DV, "dim_q": 48,
        "seq2vec": {"arch": "2-lstm", "emb_size": 16, "hidden_size": 24},
        "attention": {"nb_glimpses": 2, "dropout_v": 0.5, "dropout_q": 0.5,
                      "dropout_mm": 0.5, "activation_v": "tanh",
                      "activation_q": "tanh", "activation_mm": "tanh",
                      "dim_h": 20, "dim_hv": 16, "dim_hq": 16, "dim_mm": 16,
                      "R": 2},
        "fusion": {"dim_h": 12, "dim_hv": 16, "dim_hq": 16, "dim_mm": 16,
                   "R": 2, "dropout_v": 0.5, "dropout_q": 0.5,
                   "activation_v": "tanh", "activation_q": "tanh"},
        "classif": {"dropout": 0.5},
    }
    model = factory.factory_vqa(opt, words, answers)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(B, 4, 4, DV)), jnp.float32)
    q = jnp.asarray(rng.integers(0, 15, size=(B, 26)), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, v, q,
        deterministic=True)
    out, att = model.apply(variables, v, q, deterministic=True,
                           return_att=True)
    assert out.shape == (B, NANS)
    assert att.shape == (B, 2, 16)  # (B, glimpses, W*H)
    np.testing.assert_allclose(np.asarray(att.sum(-1)), np.ones((B, 2)),
                               rtol=1e-5)

"""Reference-checkpoint porting: torch state_dicts with the reference's
exact module/key names port into our flax trees and reproduce the torch
forward bit-for-bit (to f32 tolerance).

The torch oracles below are assembled from the reference formulas with the
reference attribute names (``vqa/models/noatt.py``, ``att.py:11-223``,
``fusion.py:53-121``, ``cx.py:218-333``), so ``state_dict()`` emits exactly
the key set a real reference checkpoint contains.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from vqa_counterexamples_tpu.models import factory, port_torch

# ---- shared dims ----------------------------------------------------------
V, EMB, H = 11, 5, 6          # vocab, word emb, lstm hidden
DIM_Q = 2 * H                 # TwoLSTM concat
DIM_V = 10
NANS = 13
B, T = 3, 7


def _wids():
    rng = np.random.default_rng(0)
    wids = rng.integers(1, V + 1, size=(B, T)).astype(np.int32)
    wids[0, 4:] = 0
    return wids


def _select_last(states, lengths):
    return torch.stack([states[b, lengths[b] - 1]
                        for b in range(states.shape[0])])


class TorchTwoLSTM(nn.Module):
    """Reference seq2vec.TwoLSTM (seq2vec.py:49-77); batch-first oracle of
    the intended semantics, same state_dict keys."""

    def __init__(self):
        super().__init__()
        self.embedding = nn.Embedding(V + 1, EMB, padding_idx=0)
        self.rnn_0 = nn.LSTM(EMB, H, batch_first=True)
        self.rnn_1 = nn.LSTM(H, H, batch_first=True)

    def forward(self, wids):  # eval mode: dropout 0.3 = identity
        lengths = (wids != 0).sum(1)
        x = torch.tanh(self.embedding(wids))
        x0, _ = self.rnn_0(x)
        x1, _ = self.rnn_1(x0)
        return torch.cat([_select_last(x0, lengths),
                          _select_last(x1, lengths)], dim=1)


class TorchMutanFusion(nn.Module):
    """Reference fusion.MutanFusion (fusion.py:53-121), eval mode, with the
    default config shape (activation_v/q=tanh, no per-rank extras)."""

    def __init__(self, dim_v, dim_q, dim_hv, dim_hq, dim_mm, rank,
                 visual_embedding=True, question_embedding=True):
        super().__init__()
        self.ve, self.qe = visual_embedding, question_embedding
        self.rank = rank
        if visual_embedding:
            self.linear_v = nn.Linear(dim_v, dim_hv)
        if question_embedding:
            self.linear_q = nn.Linear(dim_q, dim_hq)
        self.list_linear_hv = nn.ModuleList(
            [nn.Linear(dim_hv, dim_mm) for _ in range(rank)])
        self.list_linear_hq = nn.ModuleList(
            [nn.Linear(dim_hq, dim_mm) for _ in range(rank)])

    def forward(self, v, q):
        x_v = torch.tanh(self.linear_v(v)) if self.ve else v
        x_q = torch.tanh(self.linear_q(q)) if self.qe else q
        x_mm = 0
        for r in range(self.rank):
            x_mm = x_mm + self.list_linear_hv[r](x_v) \
                * self.list_linear_hq[r](x_q)
        return x_mm


class TorchMutanNoAtt(nn.Module):
    """Reference noatt.MutanNoAtt (noatt.py:49-58)."""

    def __init__(self, fus):
        super().__init__()
        self.seq2vec = TorchTwoLSTM()
        self.fusion = TorchMutanFusion(DIM_V, DIM_Q, fus["dim_hv"],
                                       fus["dim_hq"], fus["dim_mm"], fus["R"])
        self.linear_classif = nn.Linear(fus["dim_mm"], NANS)

    def forward(self, v, wids):
        q = self.seq2vec(wids)
        return self.linear_classif(self.fusion(v, q))


FUS = dict(dim_hv=8, dim_hq=7, dim_mm=9, R=3)


def _noatt_opt():
    return {
        "arch": "MutanNoAtt", "dim_v": DIM_V, "dim_q": DIM_Q,
        "seq2vec": {"arch": "2-lstm", "emb_size": EMB, "hidden_size": H},
        "fusion": {"dim_v": DIM_V, "dim_q": DIM_Q, "dropout_v": 0.5,
                   "dropout_q": 0.5, "activation_v": "tanh",
                   "activation_q": "tanh", "dropout_hv": 0, "dropout_hq": 0,
                   **FUS},
        "classif": {"dropout": 0.5},
    }


def _init_flax(model, *args):
    import jax

    return model.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1),
                       "lesion": jax.random.key(2)}, *args,
                      deterministic=True)["params"]


def _build_ported_noatt():
    import jax.numpy as jnp

    torch.manual_seed(0)
    tmodel = TorchMutanNoAtt(_noatt_opt()["fusion"]).eval()
    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]
    model = factory.factory_vqa(_noatt_opt(), words, answers)

    wids = _wids()
    visual = np.random.default_rng(1).normal(
        size=(B, DIM_V)).astype(np.float32)
    template = _init_flax(model, jnp.asarray(visual), jnp.asarray(wids))
    ported, arch = port_torch.port_vqa_state_dict(tmodel.state_dict())
    assert arch == "MutanNoAtt"
    params = port_torch.graft(template, ported)
    return tmodel, model, params, visual, wids


def test_port_mutan_noatt_forward_parity():
    import jax.numpy as jnp

    tmodel, model, params, visual, wids = _build_ported_noatt()
    with torch.no_grad():
        oracle = tmodel(torch.from_numpy(visual),
                        torch.from_numpy(wids.astype(np.int64))).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(visual),
                                  jnp.asarray(wids), deterministic=True))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


class TorchMutanAtt(nn.Module):
    """Reference att.MutanAtt (att.py:195-223) with the reference attention
    forward (att.py:39-163), eval mode."""

    def __init__(self, att, fus, glimpses):
        super().__init__()
        self.att, self.fus, self.g = att, fus, glimpses
        self.seq2vec = TorchTwoLSTM()
        self.conv_v_att = nn.Conv2d(DIM_V, att["dim_hv"], 1, 1)
        self.linear_q_att = nn.Linear(DIM_Q, att["dim_hq"])
        self.conv_att = nn.Conv2d(att["dim_mm"], glimpses, 1, 1)
        self.fusion_att = TorchMutanFusion(
            0, 0, att["dim_hv"], att["dim_hq"], att["dim_mm"], att["R"],
            visual_embedding=False, question_embedding=False)
        self.list_linear_v_fusion = nn.ModuleList(
            [nn.Linear(DIM_V, fus["dim_hv"] // glimpses)
             for _ in range(glimpses)])
        self.linear_q_fusion = nn.Linear(DIM_Q, fus["dim_hq"])
        self.fusion_classif = TorchMutanFusion(
            0, 0, fus["dim_hv"], fus["dim_hq"], fus["dim_mm"], fus["R"],
            visual_embedding=False, question_embedding=False)
        self.linear_classif = nn.Linear(fus["dim_mm"], NANS)

    def forward(self, v_nchw, wids):
        bsz, dim_v, hh, ww = v_nchw.shape
        wh = hh * ww
        q = self.seq2vec(wids)
        # attention (att.py:39-99); dropout = identity in eval
        x_v = torch.tanh(self.conv_v_att(v_nchw))
        x_v = x_v.view(bsz, self.att["dim_hv"], wh).transpose(1, 2)
        x_q = torch.tanh(self.linear_q_att(q))
        x_q = x_q.view(bsz, 1, -1).expand(bsz, wh, self.att["dim_hq"])
        x_att = self.fusion_att(x_v.reshape(bsz * wh, -1),
                                x_q.reshape(bsz * wh, -1)).view(bsz, wh, -1)
        x_att = torch.tanh(x_att)  # activation_mm
        # (the reference's double transpose via view(w, h) reconstructs the
        # same (B, mm, H, W) layout for square maps, att.py:83-88)
        x_att = x_att.view(bsz, hh, ww, -1).permute(0, 3, 1, 2)
        x_att = self.conv_att(x_att).reshape(bsz, self.g, wh)
        att_maps = F.softmax(x_att, dim=2)
        v_flat = v_nchw.view(bsz, dim_v, wh).transpose(1, 2)
        # glimpse fusion (att.py:120-143)
        glimpses = []
        for i in range(self.g):
            v_att = (att_maps[:, i, :, None] * v_flat).sum(1)
            glimpses.append(torch.tanh(self.list_linear_v_fusion[i](v_att)))
        x_v2 = torch.cat(glimpses, dim=1)
        x_q2 = torch.tanh(self.linear_q_fusion(q))
        z = self.fusion_classif(x_v2, x_q2)
        return self.linear_classif(z)


def test_port_mutan_att_forward_parity():
    import jax.numpy as jnp

    att = dict(dim_hv=8, dim_hq=7, dim_mm=9, R=2, nb_glimpses=2,
               dropout_v=0.5, dropout_q=0.5, dropout_mm=0.5,
               activation_v="tanh", activation_q="tanh",
               activation_mm="tanh")
    fus = dict(dim_hv=8, dim_hq=6, dim_mm=9, R=3, dropout_v=0.5,
               dropout_q=0.5, activation_v="tanh", activation_q="tanh",
               dropout_hv=0, dropout_hq=0)
    opt = {"arch": "MutanAtt", "dim_v": DIM_V, "dim_q": DIM_Q,
           "seq2vec": {"arch": "2-lstm", "emb_size": EMB, "hidden_size": H},
           "attention": dict(att), "fusion": dict(fus),
           "classif": {"dropout": 0.5}}

    torch.manual_seed(1)
    tmodel = TorchMutanAtt(att, fus, att["nb_glimpses"]).eval()
    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]
    model = factory.factory_vqa(opt, words, answers)

    wids = _wids()
    hh = ww = 3
    v = np.random.default_rng(2).normal(
        size=(B, hh, ww, DIM_V)).astype(np.float32)
    template = _init_flax(model, jnp.asarray(v), jnp.asarray(wids))
    ported, arch = port_torch.port_vqa_state_dict(tmodel.state_dict())
    assert arch == "MutanAtt"
    params = port_torch.graft(template, ported)

    with torch.no_grad():
        oracle = tmodel(
            torch.from_numpy(np.transpose(v, (0, 3, 1, 2)).copy()),
            torch.from_numpy(wids.astype(np.int64))).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(v),
                                  jnp.asarray(wids), deterministic=True))
    # our attention stage folds the q side into a per-example effective
    # weight (models/fusion.py fuse_candidates) — same math, reassociated
    # f32 rounding, so the tolerance is looser than the NoAtt bitwise case
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=2e-4)


class TorchNeuralCX(nn.Module):
    """Reference cx.NeuralModel (cx.py:218-333), eval mode, all features on
    (default model_spec), over a MutanNoAtt backbone."""

    def __init__(self, vqa, knn_size, dim_a, dim_h):
        super().__init__()
        self.vqa_model = vqa
        self.K = knn_size
        self.answer_embedding = nn.Embedding(NANS, dim_a)
        input_size = (3 * DIM_V + 2 * dim_a + 2 * FUS["dim_mm"] + DIM_Q
                      + knn_size + 1)
        self.linear_1 = nn.Linear(input_size, dim_h)
        self.linear_2 = nn.Linear(dim_h, dim_h)
        self.out = nn.Linear(dim_h, 1)

    def forward(self, image_features, wids, answer_aids):
        bsz = image_features.shape[0]
        v_orig, v_knns = image_features[:, 0], image_features[:, 1:]
        # vqa_forward (cx.py:64-104)
        q_emb = self.vqa_model.seq2vec(wids)
        v_all = image_features.reshape(bsz * (self.K + 1), -1)
        q_dup = q_emb[:, None, :].expand(
            bsz, self.K + 1, -1).reshape(bsz * (self.K + 1), -1)
        z = self.vqa_model.fusion(v_all, q_dup)
        a = self.vqa_model.linear_classif(z)
        z = z.view(bsz, self.K + 1, -1)
        a = a.view(bsz, self.K + 1, -1)
        z_orig, z_knns, a_knns = z[:, 0], z[:, 1:], a[:, 1:]
        # answer embeddings (cx.py:279-282)
        a_emb_gt = self.answer_embedding(answer_aids)
        probs = F.softmax(a_knns, dim=-1)
        a_emb_knns = torch.bmm(
            probs, self.answer_embedding.weight[None].expand(bsz, -1, -1))
        scores = []
        for i in range(self.K):
            v_other = v_knns[:, i]
            v_mult = v_orig * v_other
            v_dist = torch.sqrt(
                ((v_orig - v_other + 1e-6) ** 2).sum(1, keepdim=True))
            v_rank = torch.zeros(bsz, self.K)
            v_rank[:, i] = 1
            x = torch.cat([v_orig, v_other, v_mult, v_dist, v_rank, q_emb,
                           z_orig, z_knns[:, i], a_emb_gt, a_emb_knns[:, i]],
                          dim=1)
            h = F.relu(self.linear_1(x))
            h = F.relu(self.linear_2(h))
            scores.append(self.out(h))
        return torch.cat(scores, dim=1)


def test_port_neural_cx_forward_parity():
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from vqa_counterexamples_tpu.models import cx as cx_mod

    K, DIM_A, DIM_H = 4, 8, 12
    torch.manual_seed(2)
    tmodel = TorchNeuralCX(TorchMutanNoAtt(_noatt_opt()["fusion"]), K,
                           DIM_A, DIM_H).eval()

    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]
    vqa_model = factory.factory_vqa(_noatt_opt(), words, answers)
    spec = dict(dim_h=DIM_H, n_layers=2, drop_p=0.25, v_emb=True,
                v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                a_emb=True, z_emb=True, pretrained_emb=False,
                trainable_vqa=False)
    model = cx_mod.NeuralModel(model_spec=FrozenDict(spec), dim_h=DIM_H,
                               n_layers=2, drop_p=0.25, dim_a=DIM_A,
                               vqa_model=vqa_model, knn_size=K,
                               trainable_vqa=False)

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(B, K + 1, DIM_V)).astype(np.float32)
    wids = _wids()
    aids = rng.integers(0, NANS, size=(B,)).astype(np.int32)

    template = _init_flax(model, jnp.asarray(feats), jnp.asarray(wids),
                          jnp.asarray(aids))
    ported, cx_name, vqa_arch = port_torch.port_cx_state_dict(
        tmodel.state_dict())
    assert cx_name == "NeuralModel" and vqa_arch == "MutanNoAtt"
    params = port_torch.graft(template, ported)

    with torch.no_grad():
        oracle = tmodel(torch.from_numpy(feats),
                        torch.from_numpy(wids.astype(np.int64)),
                        torch.from_numpy(aids.astype(np.int64))).numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(wids),
        jnp.asarray(aids), deterministic=True,
        rngs={"lesion": __import__("jax").random.key(9)}))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_port_pairwise_and_contrastive_forward_parity():
    """The simpler CX heads port too: PairwiseModel (cx.py:336-376) and
    ContrastiveModel (cx.py:428-476; its dangling answer_embedding param is
    dropped — never read in forward)."""
    import jax
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.models import cx as cx_mod

    K = 3
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(B, K + 1, DIM_V)).astype(np.float32)
    wids = _wids()
    aids = rng.integers(0, NANS, size=(B,)).astype(np.int32)
    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]

    class TorchPairwise(nn.Module):
        def __init__(self, vqa):
            super().__init__()
            self.vqa_model = vqa
            self.linear = nn.Linear(2 * DIM_V + DIM_Q + FUS["dim_mm"], 300)
            self.out = nn.Linear(300, 1)

        def forward(self, feats, wids):
            bsz = feats.shape[0]
            v_orig = feats[:, 0]
            q = self.vqa_model.seq2vec(wids)
            v_all = feats.reshape(bsz * (K + 1), -1)
            q_dup = q[:, None, :].expand(bsz, K + 1, -1) \
                .reshape(bsz * (K + 1), -1)
            z = self.vqa_model.fusion(v_all, q_dup).view(bsz, K + 1, -1)
            scores = []
            for i in range(K):
                x = torch.cat([v_orig, feats[:, i + 1], q, z[:, i + 1]],
                              dim=1)
                scores.append(F.relu(self.out(F.relu(self.linear(x)))))
            return torch.cat(scores, dim=1)

    class TorchContrastive(nn.Module):
        def __init__(self, vqa):
            super().__init__()
            self.vqa_model = vqa
            self.answer_embedding = nn.Embedding(NANS, 300)  # dangling
            self.linear = nn.Linear(DIM_V + FUS["dim_mm"], 300)

        def forward(self, feats, wids):
            bsz = feats.shape[0]
            q = self.vqa_model.seq2vec(wids)
            v_all = feats.reshape(bsz * (K + 1), -1)
            q_dup = q[:, None, :].expand(bsz, K + 1, -1) \
                .reshape(bsz * (K + 1), -1)
            z = self.vqa_model.fusion(v_all, q_dup).view(bsz, K + 1, -1)
            return F.relu(self.linear(torch.cat([feats, z], dim=2)))

    for torch_cls, flax_name, apply_kwargs in (
            (TorchPairwise, "PairwiseModel", {}),
            (TorchContrastive, "ContrastiveModel", {})):
        torch.manual_seed(6)
        tmodel = torch_cls(TorchMutanNoAtt(_noatt_opt()["fusion"])).eval()
        vqa_model = factory.factory_vqa(_noatt_opt(), words, answers)
        if flax_name == "PairwiseModel":
            model = cx_mod.PairwiseModel(vqa_model=vqa_model, knn_size=K,
                                         trainable_vqa=False)
        else:
            model = cx_mod.ContrastiveModel(vqa_model=vqa_model, knn_size=K,
                                            trainable_vqa=False)
        template = _init_flax(model, jnp.asarray(feats), jnp.asarray(wids),
                              jnp.asarray(aids))
        ported, cx_name, _ = port_torch.port_cx_state_dict(
            tmodel.state_dict(), cx_model=flax_name)
        assert cx_name == flax_name
        params = port_torch.graft(template, ported)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(feats),
                            torch.from_numpy(wids.astype(np.int64))).numpy()
        ours = np.asarray(model.apply(
            {"params": params}, jnp.asarray(feats), jnp.asarray(wids),
            jnp.asarray(aids), deterministic=True,
            rngs={"lesion": jax.random.key(0)}, **apply_kwargs))
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_port_uniskip_gru_forward_parity():
    """seq2vec keys of a UniSkip-style torch GRU (embedding + nn.GRU) port
    into our SkipThoughts module and reproduce the torch forward."""
    import jax
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.models.seq2vec import SkipThoughts

    HID = 9

    class TorchUniSkip(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(V + 1, EMB, padding_idx=0)
            self.rnn = nn.GRU(EMB, HID, batch_first=True)

        def forward(self, wids):
            lengths = (wids != 0).sum(1)
            out, _ = self.rnn(self.embedding(wids))
            return _select_last(out, lengths)

    torch.manual_seed(3)
    tmodel = TorchUniSkip().eval()
    ported = port_torch.port_seq2vec(
        {k: v for k, v in tmodel.state_dict().items()})

    model = SkipThoughts(vocab_size=V, dropout=0.25, fixed_emb=False,
                         bayesian=False, emb_size=EMB, hidden_size=HID)
    wids = _wids()
    template = model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          jnp.asarray(wids), deterministic=True)["params"]
    params = port_torch.graft(template, ported)
    with torch.no_grad():
        oracle = tmodel(torch.from_numpy(wids.astype(np.int64))).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wids),
                                  deterministic=True))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_infer_cx_model_names():
    sd_pl = {"answer_embedding.weight": np.zeros((5, 3)),
             "linear.weight": np.zeros((3, 8)), "linear.bias": np.zeros(3),
             "out.weight": np.zeros((1, 3)), "out.bias": np.zeros(1)}
    assert port_torch.infer_cx_model(sd_pl) == "PairwiseLinearModel"
    sd_pw = {k: v for k, v in sd_pl.items()
             if not k.startswith("answer_embedding")}
    assert port_torch.infer_cx_model(sd_pw) == "PairwiseModel"
    # LinearContext: Linear(K*dim_z -> K); Contrastive: Linear(... -> 300)
    assert port_torch.infer_cx_model(
        {"linear.weight": np.zeros((24, 24 * 9)),
         "linear.bias": np.zeros(24)}) == "LinearContext"
    assert port_torch.infer_cx_model(
        {"linear.weight": np.zeros((300, 19)),
         "linear.bias": np.zeros(300)}) == "ContrastiveModel"


def test_port_checkpoint_cli_roundtrip(tmp_path):
    """cli/port_checkpoint writes files the framework loaders consume:
    the VQA triple resolves through core.checkpoint.load_vqa_checkpoint's
    ``<dir>/best`` prefix contract, and the CX msgpack deserializes against
    an initialized params tree (the --init_params path)."""
    import jax.numpy as jnp

    from vqa_counterexamples_tpu.cli import port_checkpoint
    from vqa_counterexamples_tpu.core import checkpoint as ckpt_lib

    torch.manual_seed(4)
    tmodel = TorchMutanNoAtt(_noatt_opt()["fusion"]).eval()
    src = tmp_path / "best_model.pth.tar"
    torch.save(tmodel.state_dict(), str(src))

    out_dir = tmp_path / "ported_vqa"
    port_checkpoint.main(["--src", str(src), "--kind", "vqa",
                          "--out", str(out_dir)])

    words = ["w%d" % i for i in range(V)]
    answers = ["a%d" % i for i in range(NANS)]
    model = factory.factory_vqa(_noatt_opt(), words, answers)
    wids = _wids()
    visual = np.zeros((B, DIM_V), np.float32)
    template = _init_flax(model, jnp.asarray(visual), jnp.asarray(wids))

    info, loaded, _ = ckpt_lib.load_vqa_checkpoint(
        template, None, str(out_dir / "best"))
    assert info["arch"] == "MutanNoAtt"
    expect = port_torch.graft(
        template, port_torch.port_vqa_state_dict(tmodel.state_dict())[0])
    np.testing.assert_allclose(
        np.asarray(loaded["linear_classif"]["kernel"]),
        np.asarray(expect["linear_classif"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(loaded["fusion_module"]["w_hv"]),
        np.asarray(expect["fusion_module"]["w_hv"]))

    # CX params file -> load_pytree against an initialized tree
    from flax.core import FrozenDict

    from vqa_counterexamples_tpu.models import cx as cx_mod

    K, DIM_A, DIM_H = 4, 8, 12
    tcx = TorchNeuralCX(TorchMutanNoAtt(_noatt_opt()["fusion"]), K,
                        DIM_A, DIM_H).eval()
    src_cx = tmp_path / "model.ckpt"
    torch.save(tcx.state_dict(), str(src_cx))
    out_cx = tmp_path / "cx_params.msgpack"
    port_checkpoint.main(["--src", str(src_cx), "--kind", "cx",
                          "--out", str(out_cx)])

    spec = dict(dim_h=DIM_H, n_layers=2, drop_p=0.25, v_emb=True,
                v_mult=True, v_dist=True, v_rank=True, q_emb=True,
                a_emb=True, z_emb=True, pretrained_emb=False,
                trainable_vqa=False)
    vqa_model = factory.factory_vqa(_noatt_opt(), words, answers)
    cxm = cx_mod.NeuralModel(model_spec=FrozenDict(spec), dim_h=DIM_H,
                             n_layers=2, drop_p=0.25, dim_a=DIM_A,
                             vqa_model=vqa_model, knn_size=K,
                             trainable_vqa=False)
    feats = np.zeros((B, K + 1, DIM_V), np.float32)
    aids = np.zeros((B,), np.int32)
    cx_template = _init_flax(cxm, jnp.asarray(feats), jnp.asarray(wids),
                             jnp.asarray(aids))
    loaded_cx = ckpt_lib.load_pytree(cx_template, str(out_cx))
    np.testing.assert_allclose(
        np.asarray(loaded_cx["linear_1_w"]),
        np.asarray(tcx.linear_1.weight.detach().numpy().T))


def test_graft_shape_mismatch_raises():
    import pytest

    with pytest.raises(port_torch.PortError, match="shape mismatch"):
        port_torch.graft({"a": np.zeros((2, 3))}, {"a": np.zeros((3, 2))})
    with pytest.raises(port_torch.PortError, match="not in the model tree"):
        port_torch.graft({"a": np.zeros((2, 3))}, {"b": np.zeros((2, 3))})

"""Port trained reference (PyTorch) checkpoints into this framework.

A user of the reference repo holds torch ``state_dict`` checkpoints:

* VQA classifiers from ``train.py`` (``ckpt_model.pth.tar`` /
  ``best_model.pth.tar``) — MutanNoAtt / MLBNoAtt / MutanAtt / MLBAtt with
  an LSTM / TwoLSTM / skip-thoughts encoder (reference ``train.py:290-330``);
* CX models from ``counterexamples.py`` (``ckpt/model.ckpt``) — NeuralModel
  etc., with the VQA model nested under the ``vqa_model.`` prefix
  (reference ``counterexamples.py:550-560``; the VQA submodule rides along
  in ``state_dict()``).

This module maps those key trees onto our flax parameter trees so the
checkpoints drop straight into the TPU pipeline (``cli/port_checkpoint.py``
is the command-line wrapper).  The mapping is shape-driven and the
architecture is inferred from the keys themselves:

* ``conv_v_att.weight`` present        -> attention model (else NoAtt);
* ``fusion*.list_linear_hv.0.weight``  -> MUTAN fusion (else MLB);
* ``seq2vec.rnn_0.weight_ih_l0``       -> TwoLSTM;
  ``seq2vec.rnn.weight_ih_l0`` with 4H rows -> LSTM, with 3H rows ->
  skip-thoughts GRU (UniSkip); ``seq2vec.gru_cell.*`` -> BayesianUniSkip.

Layout conversions (verified against the reference modules):
torch ``nn.Linear.weight`` (out, in) -> flax ``kernel`` (in, out);
1x1 ``nn.Conv2d.weight`` (out, in, 1, 1) -> Dense kernel (in, out)
(our attention towers are Dense over channels-last, models/att.py:42-44);
the MUTAN per-rank ``list_linear_hv.{r}`` stack into our fused
``w_hv`` (din, R*dmm) column blocks (models/fusion.py:156-163);
torch LSTM/GRU ``weight_*_l0`` (gates*H, D) transpose into our (D, gates*H)
scan-cell layout with identical gate order (ops/rnn.py).
"""

from __future__ import annotations

import numpy as np

from ..ops.rnn import GRUParams, LSTMParams


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _f32(v):
    return _np(v).astype(np.float32)


class PortError(ValueError):
    pass


def _sub(sd: dict, prefix: str) -> dict:
    """Sub-dict of keys under ``prefix.``, prefix stripped."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def _dense(sd: dict, name: str) -> dict:
    """torch nn.Linear -> flax Dense params."""
    return {"kernel": _f32(sd[name + ".weight"]).T,
            "bias": _f32(sd[name + ".bias"])}


def _conv1x1(sd: dict, name: str) -> dict:
    """torch 1x1 nn.Conv2d -> Dense over channels-last."""
    w = _f32(sd[name + ".weight"])
    if w.ndim == 4:
        if w.shape[2:] != (1, 1):
            raise PortError("%s is a %sx%s conv, expected 1x1"
                            % (name, w.shape[2], w.shape[3]))
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": _f32(sd[name + ".bias"])}


# ---------------------------------------------------------------------------
# seq2vec
# ---------------------------------------------------------------------------

def _lstm_params(sd: dict, prefix: str, layer: int = 0) -> LSTMParams:
    """torch nn.LSTM layer -> our LSTMParams (gate order i,f,g,o matches)."""
    return LSTMParams(
        w_ih=_f32(sd["%s.weight_ih_l%d" % (prefix, layer)]).T,
        b_ih=_f32(sd["%s.bias_ih_l%d" % (prefix, layer)]),
        w_hh=_f32(sd["%s.weight_hh_l%d" % (prefix, layer)]).T,
        b_hh=_f32(sd["%s.bias_hh_l%d" % (prefix, layer)]))


def port_seq2vec(sd: dict) -> dict:
    """``seq2vec.``-stripped torch keys -> our seq2vec param subtree.

    Handles TwoLSTM (reference seq2vec.py:49-60: embedding + rnn_0 + rnn_1),
    LSTM (embedding + multi-layer rnn), and the skip-thoughts encoders
    (UniSkip: embedding + nn.GRU ``rnn``; BayesianUniSkip: embedding +
    ``gru_cell`` parameters) via the same key contract as
    ``cli/port_skipthoughts.convert_state_dict``.
    """
    emb = _f32(sd["embedding.weight"])
    if "rnn_0.weight_ih_l0" in sd:  # TwoLSTM
        return {"embedding": {"embedding": emb},
                "lstm_0": _lstm_params(sd, "rnn_0"),
                "lstm_1": _lstm_params(sd, "rnn_1")}
    if "gru_cell.weight_ih" in sd:  # BayesianUniSkip (pre-packed layout)
        return {"embedding": emb,
                "gru": GRUParams(w_ih=_f32(sd["gru_cell.weight_ih"]).T,
                                 b_ih=_f32(sd["gru_cell.bias_ih"]),
                                 w_hh=_f32(sd["gru_cell.weight_hh"]).T,
                                 b_hh=_f32(sd["gru_cell.bias_hh"]))}
    for cell in ("rnn.gru_cell", "gru_cell"):
        # genuine skip-thoughts.torch BayesianGRUCell: six per-gate Linears
        # weight_{ir,ii,in} (input, bias_ih=True) + weight_{hr,hi,hn}
        # (recurrent, bias_hh=False).  Gate roles: r=reset, i=carry
        # (hx = (1-i)*n + i*hx), n=new — packed into our (r, z, n) order
        # with z <- i.
        if "%s.weight_ir.weight" % cell not in sd:
            continue
        def _gate(g):
            return _f32(sd["%s.weight_%s.weight" % (cell, g)]).T
        def _gate_b(g, dim):
            key = "%s.weight_%s.bias" % (cell, g)
            return _f32(sd[key]) if key in sd else np.zeros(dim, np.float32)
        w_ih = np.concatenate([_gate("ir"), _gate("ii"), _gate("in")], axis=1)
        w_hh = np.concatenate([_gate("hr"), _gate("hi"), _gate("hn")], axis=1)
        hid = w_hh.shape[0]
        b_ih = np.concatenate([_gate_b("ir", hid), _gate_b("ii", hid),
                               _gate_b("in", hid)])
        b_hh = np.concatenate([_gate_b("hr", hid), _gate_b("hi", hid),
                               _gate_b("hn", hid)])
        return {"embedding": emb,
                "gru": GRUParams(w_ih=w_ih, b_ih=b_ih, w_hh=w_hh, b_hh=b_hh)}
    if "rnn.weight_ih_l0" in sd:
        w = _np(sd["rnn.weight_ih_l0"])
        hidden = _np(sd["rnn.weight_hh_l0"]).shape[1]
        if w.shape[0] == 3 * hidden:  # UniSkip GRU
            return {"embedding": emb,
                    "gru": GRUParams(w_ih=_f32(w).T,
                                     b_ih=_f32(sd["rnn.bias_ih_l0"]),
                                     w_hh=_f32(sd["rnn.weight_hh_l0"]).T,
                                     b_hh=_f32(sd["rnn.bias_hh_l0"]))}
        # stacked LSTM layers
        out = {"embedding": {"embedding": emb}}
        layer = 0
        while "rnn.weight_ih_l%d" % layer in sd:
            out["lstm_%d" % layer] = _lstm_params(sd, "rnn", layer)
            layer += 1
        return out
    raise PortError("unrecognized seq2vec keys: %s" % sorted(sd)[:5])


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------

def _stack_rank_linears(sd: dict, name: str):
    """``{name}.{r}.weight/bias`` per-rank linears -> fused (din, R*dmm)."""
    rank = 0
    while "%s.%d.weight" % (name, rank) in sd:
        rank += 1
    if rank == 0:
        raise PortError("no %s.{r}.weight keys" % name)
    ws = [_f32(sd["%s.%d.weight" % (name, r)]).T for r in range(rank)]
    bs = [_f32(sd["%s.%d.bias" % (name, r)]) for r in range(rank)]
    return np.concatenate(ws, axis=1), np.concatenate(bs, axis=0), rank


def port_mutan_fusion(sd: dict) -> dict:
    """``fusion.``-stripped MutanFusion keys -> our MutanFusion subtree.
    ``linear_v``/``linear_q`` are absent when the reference constructed the
    module with visual/question_embedding=False (the attention stages)."""
    w_hv, b_hv, r_v = _stack_rank_linears(sd, "list_linear_hv")
    w_hq, b_hq, r_q = _stack_rank_linears(sd, "list_linear_hq")
    if r_v != r_q:
        raise PortError("rank mismatch: %d hv vs %d hq" % (r_v, r_q))
    out = {"w_hv": w_hv, "b_hv": b_hv, "w_hq": w_hq, "b_hq": b_hq}
    if "linear_v.weight" in sd:
        out["linear_v"] = _dense(sd, "linear_v")
    if "linear_q.weight" in sd:
        out["linear_q"] = _dense(sd, "linear_q")
    return out


def port_mlb_fusion(sd: dict) -> dict:
    out = {}
    if "linear_v.weight" in sd:
        out["linear_v"] = _dense(sd, "linear_v")
    if "linear_q.weight" in sd:
        out["linear_q"] = _dense(sd, "linear_q")
    return out


# ---------------------------------------------------------------------------
# VQA models
# ---------------------------------------------------------------------------

def infer_vqa_arch(sd: dict) -> str:
    att = any(k.startswith("conv_v_att.") for k in sd)
    if att:
        mutan = any(k.startswith("fusion_classif.list_linear_hv.")
                    for k in sd)
        return "MutanAtt" if mutan else "MLBAtt"
    mutan = any(k.startswith("fusion.list_linear_hv.") for k in sd)
    return "MutanNoAtt" if mutan else "MLBNoAtt"


def port_vqa_state_dict(sd: dict) -> tuple:
    """Full reference VQA ``state_dict`` -> (our params tree, arch name).

    NoAtt trees: seq2vec / fusion_module / linear_classif
    (models/noatt.py:29-39).  Att trees additionally carry the attention
    tower (conv_v_att, linear_q_att, conv_att as Dense), the per-glimpse
    ``list_linear_v_fusion_{g}``, linear_q_fusion and — for MutanAtt — the
    two embedded fusion modules (models/att.py:35-53).
    """
    sd = {k: v for k, v in sd.items()}
    arch = infer_vqa_arch(sd)
    params = {"seq2vec": port_seq2vec(_sub(sd, "seq2vec")),
              "linear_classif": _dense(sd, "linear_classif")}
    if arch in ("MutanNoAtt", "MLBNoAtt"):
        fsd = _sub(sd, "fusion")
        params["fusion_module"] = (port_mutan_fusion(fsd)
                                   if arch == "MutanNoAtt"
                                   else port_mlb_fusion(fsd))
        return params, arch
    # attention towers
    params["conv_v_att"] = _conv1x1(sd, "conv_v_att")
    params["linear_q_att"] = _dense(sd, "linear_q_att")
    params["conv_att"] = _conv1x1(sd, "conv_att")
    g = 0
    while "list_linear_v_fusion.%d.weight" % g in sd:
        params["list_linear_v_fusion_%d" % g] = _dense(
            sd, "list_linear_v_fusion.%d" % g)
        g += 1
    if g == 0:
        raise PortError("no list_linear_v_fusion.{g} keys")
    params["linear_q_fusion"] = _dense(sd, "linear_q_fusion")
    if arch == "MutanAtt":
        params["fusion_att_module"] = port_mutan_fusion(
            _sub(sd, "fusion_att"))
        params["fusion_classif_module"] = port_mutan_fusion(
            _sub(sd, "fusion_classif"))
    return params, arch


# ---------------------------------------------------------------------------
# CX models
# ---------------------------------------------------------------------------

def infer_cx_model(sd: dict) -> str:
    own = {k for k in sd if not k.startswith("vqa_model.")}
    if "linear_1.weight" in own:
        return "NeuralModel"
    if "out.weight" in own:
        return ("PairwiseLinearModel" if "answer_embedding.weight" in own
                else "PairwiseModel")
    if "linear.weight" in own:
        # LinearContext: Linear(K*dim_z -> K) — out_features == knn_size
        # (asserted 24 in the reference, cx.py:145) and in_features a
        # multiple of it; ContrastiveModel: Linear(dim_v+dim_z -> 300)
        w = _np(sd["linear.weight"])
        return "LinearContext" if (w.shape[0] == 24
                                   and w.shape[1] % w.shape[0] == 0) \
            else "ContrastiveModel"
    raise PortError("unrecognized CX model keys: %s" % sorted(own)[:6])


def port_cx_state_dict(sd: dict, cx_model: str | None = None) -> tuple:
    """Full reference CX ``state_dict`` -> (our params tree, model name,
    vqa arch).  The nested ``vqa_model.*`` keys port via
    :func:`port_vqa_state_dict`; unused reference params (e.g. the
    ContrastiveModel's dangling answer_embedding, cx.py:441-442 — never
    read in forward) are dropped.
    """
    sd = {k: v for k, v in sd.items()}
    model = cx_model or infer_cx_model(sd)
    vqa_params, vqa_arch = port_vqa_state_dict(_sub(sd, "vqa_model"))
    params = {"vqa_model": vqa_params}
    if model == "NeuralModel":
        params["answer_embedding"] = _f32(sd["answer_embedding.weight"])
        layer = 1
        while "linear_%d.weight" % layer in sd:
            params["linear_%d_w" % layer] = _f32(
                sd["linear_%d.weight" % layer]).T
            params["linear_%d_b" % layer] = _f32(
                sd["linear_%d.bias" % layer])
            layer += 1
        params["out_w"] = _f32(sd["out.weight"]).T
        params["out_b"] = _f32(sd["out.bias"])
    elif model == "PairwiseModel":
        params["linear"] = _dense(sd, "linear")
        params["out"] = _dense(sd, "out")
    elif model == "PairwiseLinearModel":
        params["answer_embedding"] = {
            "embedding": _f32(sd["answer_embedding.weight"])}
        params["linear"] = _dense(sd, "linear")
        params["out"] = _dense(sd, "out")
    elif model in ("ContrastiveModel", "LinearContext"):
        params["linear"] = _dense(sd, "linear")
    else:
        raise PortError("unsupported CX model %r" % model)
    return params, model, vqa_arch


def graft(template: dict, ported: dict, path: str = "") -> dict:
    """Overlay ``ported`` onto a template tree, validating shapes leaf by
    leaf (missing template keys or shape mismatches raise with the path)."""
    from collections.abc import Mapping

    if not isinstance(template, Mapping):
        # leaf (array or NamedTuple params)
        t_shape = getattr(template, "shape", None)
        p_shape = getattr(ported, "shape", None)
        if t_shape is not None and p_shape is not None \
                and tuple(t_shape) != tuple(p_shape):
            raise PortError("shape mismatch at %s: checkpoint %s vs model %s"
                            % (path, tuple(p_shape), tuple(t_shape)))
        return ported
    out = dict(template)
    for key, value in ported.items():
        if hasattr(value, "_fields") and key in out:  # NamedTuple params
            tmpl = out[key]
            fields = {}
            for f in value._fields:
                fields[f] = graft(getattr(tmpl, f), getattr(value, f),
                                  "%s/%s.%s" % (path, key, f))
            out[key] = type(value)(**fields)
            continue
        if key not in out:
            raise PortError("checkpoint key %s/%s not in the model tree "
                            "(have: %s)" % (path, key, sorted(out)[:8]))
        out[key] = graft(out[key], value, "%s/%s" % (path, key))
    return out

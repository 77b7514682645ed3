"""Question encoders: LSTM, TwoLSTM and skip-thoughts GRUs.

Re-designs the reference ``vqa/models/seq2vec.py`` + the external
skip-thoughts.torch package (``seq2vec.py:6-8,79-97``) as flax modules over the
scan cells in ``ops/rnn.py``.  Word id 0 is padding; the sequence embedding is
the hidden state at the last valid timestep (``select_last``,
reference seq2vec.py:16-25).

Skip-thoughts flavors (Cadene skip-thoughts.torch):
  * ``UniSkip``      — 620-d word embedding -> GRU(2400), plain dropout.
  * ``BayesianUniSkip`` — same sizes, variational (per-sequence) dropout on the
    GRU input/state, the reference's default (options/vqa2/*.yaml seq2vec block:
    type BayesianUniSkip, dropout 0.25, fixed_emb False).
Pretrained weights can be imported with ``load_skipthoughts_npz`` — the same
role as the reference's ``dir_st`` download; without a weight file the encoder
trains from random init (exercised by the ``--untrained_vqa`` path).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops


class LSTMEncoder(nn.Module):
    """Reference ``LSTM`` (seq2vec.py:27-45): embed -> n-layer LSTM -> last."""
    vocab_size: int            # len(vocab_words); table has +1 rows for pad 0
    emb_size: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, wids: jax.Array, deterministic: bool = True):
        lengths = rnn_ops.process_lengths(wids)
        emb = nn.Embed(self.vocab_size + 1, self.emb_size, name="embedding")(wids)
        emb = emb * (wids != 0)[..., None]  # padding_idx=0 semantics
        # stacked layers chain time-major (the scan's native layout); only
        # the final one-timestep gather leaves it — zero relayout copies
        x = jnp.swapaxes(emb, 0, 1)
        for layer in range(self.num_layers):
            dim_in = self.emb_size if layer == 0 else self.hidden_size
            params = self.param(
                f"lstm_{layer}",
                lambda key, din=dim_in: rnn_ops.lstm_init(key, din, self.hidden_size))
            x = rnn_ops.lstm_scan(params, x, time_major_in=True,
                                  time_major_out=True)
        return rnn_ops.select_last_tm(x, lengths)


class TwoLSTM(nn.Module):
    """Reference ``TwoLSTM`` (seq2vec.py:48-76): embed -> tanh -> 2 stacked
    LSTMs, last state of each concatenated, dropout 0.3 on both halves."""
    vocab_size: int
    emb_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, wids: jax.Array, deterministic: bool = True):
        lengths = rnn_ops.process_lengths(wids)
        emb = nn.Embed(self.vocab_size + 1, self.emb_size, name="embedding")(wids)
        emb = emb * (wids != 0)[..., None]
        x = jnp.tanh(emb)
        p0 = self.param("lstm_0",
                        lambda k: rnn_ops.lstm_init(k, self.emb_size, self.hidden_size))
        p1 = self.param("lstm_1",
                        lambda k: rnn_ops.lstm_init(k, self.hidden_size, self.hidden_size))
        x0 = rnn_ops.lstm_scan(p0, jnp.swapaxes(x, 0, 1), time_major_in=True,
                               time_major_out=True)
        vec_0 = rnn_ops.select_last_tm(x0, lengths)
        x1 = rnn_ops.lstm_scan(p1, x0, time_major_in=True,
                               time_major_out=True)
        vec_1 = rnn_ops.select_last_tm(x1, lengths)
        vec_0 = nn.Dropout(0.3)(vec_0, deterministic=deterministic)
        vec_1 = nn.Dropout(0.3)(vec_1, deterministic=deterministic)
        return jnp.concatenate([vec_0, vec_1], axis=1)


class SkipThoughts(nn.Module):
    """UniSkip / BayesianUniSkip sentence encoder (620 -> GRU 2400)."""
    vocab_size: int
    dropout: float = 0.25
    fixed_emb: bool = False
    bayesian: bool = True      # BayesianUniSkip (variational dropout) vs UniSkip
    emb_size: int = 620
    hidden_size: int = 2400

    @nn.compact
    def __call__(self, wids: jax.Array, deterministic: bool = True):
        lengths = rnn_ops.process_lengths(wids)
        emb_table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size + 1, self.emb_size))
        if self.fixed_emb:
            emb_table = jax.lax.stop_gradient(emb_table)
        emb = jnp.take(emb_table, wids, axis=0)
        emb = emb * (wids != 0)[..., None]

        gru = self.param(
            "gru", lambda k: rnn_ops.gru_init(k, self.emb_size, self.hidden_size))

        if self.bayesian:
            rng = (None if deterministic
                   else self.make_rng("dropout"))
            # six independent per-gate masks by default, matching
            # skip-thoughts.torch's BayesianGRU (one SequentialDropout per
            # gate-side Linear; VERDICT r3 #4).  VQACX_GRU_SHARED_MASKS=1
            # restores the previous shared-pair approximation (A/B lever).
            import os

            per_gate = os.environ.get("VQACX_GRU_SHARED_MASKS", "0") != "1"
            states = rnn_ops.gru_scan(gru, emb, dropout=self.dropout,
                                      deterministic=deterministic, rng=rng,
                                      time_major_out=True,
                                      per_gate_masks=per_gate)
        else:
            emb = nn.Dropout(self.dropout)(emb, deterministic=deterministic)
            states = rnn_ops.gru_scan(gru, emb, time_major_out=True)
        return rnn_ops.select_last_tm(states, lengths)


def factory(vocab_words: Sequence[str], opt: dict) -> nn.Module:
    """Dispatch mirroring reference seq2vec.factory (seq2vec.py:79-97)."""
    arch = opt["arch"]
    if arch == "skipthoughts":
        return SkipThoughts(
            vocab_size=len(vocab_words),
            dropout=opt.get("dropout", 0.25),
            fixed_emb=opt.get("fixed_emb", False),
            bayesian=opt.get("type", "BayesianUniSkip").startswith("Bayesian"),
            # published skip-thoughts sizes by default; overridable for
            # tiny-dim tests of the pretrained-init wire
            emb_size=opt.get("emb_size", 620),
            hidden_size=opt.get("hidden_size", 2400),
        )
    if arch == "2-lstm":
        return TwoLSTM(vocab_size=len(vocab_words),
                       emb_size=opt["emb_size"], hidden_size=opt["hidden_size"])
    if arch == "lstm":
        return LSTMEncoder(vocab_size=len(vocab_words),
                           emb_size=opt["emb_size"],
                           hidden_size=opt["hidden_size"],
                           num_layers=opt.get("num_layers", 1))
    raise NotImplementedError(arch)


def output_dim(opt: dict) -> int:
    """Embedding width produced by the encoder selected by ``opt``."""
    arch = opt["arch"]
    if arch == "skipthoughts":
        return opt.get("hidden_size", 2400)
    if arch == "2-lstm":
        return 2 * opt["hidden_size"]
    if arch == "lstm":
        return opt["hidden_size"]
    raise NotImplementedError(arch)


def load_skipthoughts_npz(params: dict, path: str) -> dict:
    """Graft ported skip-thoughts weights (npz with embedding/w_ih/b_ih/w_hh/
    b_hh entries, produced by tools/port_skipthoughts.py) into a params tree."""
    import numpy as np

    data = np.load(path)
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    st = new["embedding"] if "embedding" in new else new
    vocab_rows = st.shape[0] if hasattr(st, "shape") else None
    del vocab_rows
    new["embedding"] = jnp.asarray(data["embedding"])
    new["gru"] = rnn_ops.GRUParams(
        w_ih=jnp.asarray(data["w_ih"]), b_ih=jnp.asarray(data["b_ih"]),
        w_hh=jnp.asarray(data["w_hh"]), b_hh=jnp.asarray(data["b_hh"]))
    return new

"""CNN + BiLSTM CTC acoustic model with canonical-text attention.

Topology-for-topology redesign of the reference CTC_Model
(egs/attention_aug/models/model_ctc.py:83-223) in flax.linen:

  acoustic:  (B, T, 243) spliced fbank
             -> Conv 3x3 s(1,2) + BN + ReLU + dropout      (32 ch)
             -> Conv 3x3 s(2,2) + BN + ReLU + dropout      (32 ch)
             -> flatten freq x channel -> 4 x BiLSTM(384)  (BN between
                layers from layer 2 on, no recurrent bias) -> (B, T', 768)
  text:      (B, L) canonical phone ids -> Embedding(512)
             -> BiLSTM(384) with bias -> values (B, L, 768)
             -> keys = Dense(768, no bias)(values)
  fusion:    scores = queries @ keys^T -> softmax (masked over padded L)
             context = weights @ values; concat -> (B, T', 1536)
  head:      BN + Dense(num_class, no bias) -> log_softmax

With use_text_attention=False the text branch is skipped and the head input
is 768 — the cnn-rnn-ctc baseline (cnn_rnn.py:136-177).

TPU-first choices versus the torch original: NHWC convs (MXU layout),
both BiLSTM directions fused into one lax.scan (ops/lstm.py), masked
attention over padded canonical positions, and a configurable compute
dtype (bfloat16 for throughput; params stay float32).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdd_tpu.ops.attention import dot_attention
from mdd_tpu.ops.lstm import bilstm


class _Dropout(nn.Module):
    """nn.Dropout, or the fused TPU-PRNG kernel when `fused` is set."""

    rate: float
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or self.rate <= 0.0:
            return x
        if self.fused:
            from mdd_tpu.ops.dropout_pallas import fused_dropout

            return fused_dropout(x, self.make_rng("dropout"), self.rate)
        return nn.Dropout(self.rate, deterministic=False)(x)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    input_dim: int = 243               # spliced feature dim (81 * 3)
    num_class: int = 43                # vocab size (blank + UNK + phones)
    conv_channels: Tuple[int, ...] = (32, 32)
    conv_kernels: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3))
    conv_strides: Tuple[Tuple[int, int], ...] = ((1, 2), (2, 2))   # (time, freq)
    conv_padding: Tuple[Tuple[int, int], ...] = ((1, 1), (1, 1))
    rnn_hidden_size: int = 384
    rnn_layers: int = 4
    use_text_attention: bool = True
    text_embed_size: int = 512
    text_vocab_size: int = 45          # >= num_class (reference hardcodes 44)
    dropout: float = 0.2
    compute_dtype: str = "float32"     # "bfloat16" for throughput runs
    use_pallas_lstm: bool = False      # fused Pallas recurrence (ops/lstm_pallas.py):
    # bit-identical forward, hand-written backward kernel ~1.7x faster
    # than scan autodiff on TPU
    use_fused_dropout: bool = False    # in-kernel TPU-PRNG dropout masks
    # (ops/dropout_pallas.py): no mask/bits tensors in HBM; backward
    # regenerates the mask from the saved 32-bit seed

    @property
    def time_downsample(self) -> int:
        d = 1
        for s in self.conv_strides:
            d *= s[0]
        return d

    @property
    def encoder_dim(self) -> int:
        return 2 * self.rnn_hidden_size

    def conv_output_dim(self) -> int:
        f = self.input_dim
        for (kt, kf), (st, sf), (pt, pf) in zip(
                self.conv_kernels, self.conv_strides, self.conv_padding):
            f = (f + 2 * pf - kf) // sf + 1
        return f * self.conv_channels[-1]

    def output_frames(self, t_in: int) -> int:
        t = t_in
        for (kt, _), (st, _), (pt, _) in zip(
                self.conv_kernels, self.conv_strides, self.conv_padding):
            t = (t + 2 * pt - kt) // st + 1
        return t


class BiLstmLayer(nn.Module):
    """BatchNorm -> BiLSTM -> dropout (reference BatchRNN, model_ctc.py:15-49)."""

    hidden_size: int
    use_batch_norm: bool = True
    use_bias: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fused_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        # x: (B, T, D); sample_mask: (B,) bool — rows excluded from the
        # batch-norm statistics (padding rows added to fill the DP mesh;
        # the torch reference always trains on true batch sizes,
        # train_ctc.py:42-98, so masked stats are the parity-correct path).
        if self.use_batch_norm:
            bn_mask = None if sample_mask is None else sample_mask[:, None, None]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype,
                             name="bn")(x, mask=bn_mask)
        d = x.shape[-1]
        h = self.hidden_size
        scale = 1.0 / (h ** 0.5)

        def init(key, shape, dtype=jnp.float32):
            # torch nn.LSTM init: U(-1/sqrt(H), 1/sqrt(H))
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        def w(name, shape):
            return self.param(name, init, shape).astype(self.dtype)

        w_ih_f = w("w_ih_fwd", (d, 4 * h))
        w_hh_f = w("w_hh_fwd", (h, 4 * h))
        w_ih_b = w("w_ih_bwd", (d, 4 * h))
        w_hh_b = w("w_hh_bwd", (h, 4 * h))
        b_f = b_b = None
        if self.use_bias:
            b_f = w("b_fwd", (4 * h,))
            b_b = w("b_bwd", (4 * h,))
        rnn = bilstm
        if self.use_pallas:
            from mdd_tpu.ops.lstm_pallas import bilstm_pallas
            rnn = bilstm_pallas
        y = rnn(x.swapaxes(0, 1), w_ih_f, w_hh_f, w_ih_b, w_hh_b, b_f, b_b)
        y = y.swapaxes(0, 1)  # (B, T, 2H)
        y = _Dropout(self.dropout, fused=self.fused_dropout,
                     name="drop")(y, train)
        return y


class ConvSubsampler(nn.Module):
    """Stacked Conv2d + BN + ReLU + dropout over (B, T, F, 1) NHWC."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        # x: (B, T, F) -> (B, T', F'*C)
        x = x[..., None].astype(self.dtype)
        cfg = self.cfg
        bn_mask = (None if sample_mask is None
                   else sample_mask[:, None, None, None])
        for i, (ch, k, s, p) in enumerate(zip(
                cfg.conv_channels, cfg.conv_kernels, cfg.conv_strides,
                cfg.conv_padding)):
            x = nn.Conv(ch, kernel_size=k, strides=s,
                        padding=[(p[0], p[0]), (p[1], p[1])],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype,
                             name=f"bn{i}")(x, mask=bn_mask)
            x = nn.relu(x)
            x = _Dropout(cfg.dropout, fused=cfg.use_fused_dropout,
                         name=f"drop{i}")(x, train)
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)


class TextEncoder(nn.Module):
    """Canonical-phone encoder: Embedding -> BiLSTM -> (values, keys)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, trans: jnp.ndarray,
                 trans_lengths: jnp.ndarray | None = None,
                 train: bool = False):
        cfg = self.cfg
        emb = nn.Embed(cfg.text_vocab_size, cfg.text_embed_size,
                       dtype=self.dtype, name="embed")(trans)
        if trans_lengths is not None:
            # Zero padded positions so the backward LSTM direction cannot
            # leak padding content into valid states (the torch reference
            # runs unpacked LSTMs and has this leak; we fix it).
            valid = jnp.arange(trans.shape[1])[None, :] < trans_lengths[:, None]
            emb = jnp.where(valid[:, :, None], emb, 0.0)
        # NOTE: the text branch stays on the lax.scan LSTM deliberately —
        # at L ~= 48 steps it is a tiny fraction of step time, and the
        # Pallas kernel's compile at this (short-T, 512-dim) shape was
        # observed to take pathologically long on the remote TPU.
        values = BiLstmLayer(cfg.rnn_hidden_size, use_batch_norm=False,
                             use_bias=True, dropout=0.0, dtype=self.dtype,
                             name="lstm")(emb, train)
        keys = nn.Dense(cfg.encoder_dim, use_bias=False, dtype=self.dtype,
                        name="key_proj")(values)
        return values, keys


class CTCAttentionModel(nn.Module):
    """The flagship model: returns (T', B, num_class) log-probs."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,           # (B, T, input_dim)
        trans: jnp.ndarray,           # (B, L) canonical phone ids
        trans_lengths: jnp.ndarray | None = None,   # (B,)
        train: bool = False,
        sample_mask: jnp.ndarray | None = None,     # (B,) bool; False rows
        # are mesh-padding and are excluded from batch-norm statistics
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)

        x = ConvSubsampler(cfg, dtype=dtype, name="conv")(
            feats, train, sample_mask)
        for i in range(cfg.rnn_layers):
            x = BiLstmLayer(cfg.rnn_hidden_size, use_batch_norm=(i > 0),
                            use_bias=False, dropout=cfg.dropout, dtype=dtype,
                            use_pallas=cfg.use_pallas_lstm,
                            fused_dropout=cfg.use_fused_dropout,
                            name=f"rnn{i}")(x, train, sample_mask)
        # x: (B, T', 768)

        if cfg.use_text_attention:
            values, keys = TextEncoder(cfg, dtype=dtype, name="text")(
                trans, trans_lengths, train)
            mask = None
            if trans_lengths is not None:
                mask = jnp.arange(trans.shape[1])[None, :] < trans_lengths[:, None]
            context, _ = dot_attention(x, keys, values, mask)
            x = jnp.concatenate([x, context], axis=-1)  # (B, T', 1536)

        head_mask = None if sample_mask is None else sample_mask[:, None, None]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=dtype,
                         name="head_bn")(x, mask=head_mask)
        logits = nn.Dense(cfg.num_class, use_bias=False, dtype=dtype,
                          name="head")(x)
        logits = logits.astype(jnp.float32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs.swapaxes(0, 1)  # (T', B, C) — reference layout

    def num_params(self, params) -> int:
        return sum(p.size for p in jax.tree.leaves(params))

"""Temporal aggregation heads over per-frame features [B, T, D] → [B, D_out].

Parity with the reference's four head families
(/root/reference/nexar_arch.py:17,83,122,149):
- attention: MHA + learnable positional embedding (max_seq_length table,
  reference :44-47) then mean-pool of the attended sequence (:78).
- conv: two temporal convolutions + norm + relu then average-pool (:98-106).
- pooling: adaptive average pool over time (:122).
- rnn/lstm/gru: recurrence via lax.scan (flax nn.RNN), optionally
  bidirectional with hidden-state concat + projection (:205-239).

TPU notes: attention/conv/pooling are fully parallel over T (MXU-friendly)
and are the performance defaults; the recurrent heads are inherently serial
over T (fine at T≈25) and exist for reference parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalAttention(nn.Module):
    """MHA with an explicit attention matrix, sown to ``intermediates`` so
    the attention-visualization path (reference
    /root/reference/nexar_arch.py:513-603) can read per-frame weights."""

    dim: int  # feature dim D (unchanged)
    num_heads: int = 4
    max_seq_length: int = 30
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, D = x.shape
        if T > self.max_seq_length:
            raise ValueError(
                f"sequence length {T} exceeds max_seq_length={self.max_seq_length}"
            )
        if D % self.num_heads:
            raise ValueError(f"dim {D} not divisible by {self.num_heads} heads")
        dh = D // self.num_heads
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.max_seq_length, D),
        )
        h = x.astype(self.dtype) + pos[:T].astype(self.dtype)

        def heads(name):
            y = nn.Dense(D, dtype=self.dtype, name=name)(h)
            return y.reshape(B, T, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(dh).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)  # [B, H, T, T]
        self.sow("intermediates", "attention_weights", attn)
        attn_c = attn.astype(self.dtype)
        if train and self.dropout > 0:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                        attn_c.shape)
            attn_c = jnp.where(mask, attn_c / keep, 0.0).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn_c, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=self.dtype, name="out")(out)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(
            out + x.astype(self.dtype)
        )
        return jnp.mean(h, axis=1).astype(jnp.float32)

    @staticmethod
    def out_dim(dim: int, hidden: int) -> int:
        return dim


class TemporalConvolution(nn.Module):
    dim: int
    hidden: int = 256
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # linen Conv over [B, T, D]: convolves T, mixes channel dim → MXU matmul.
        h = x.astype(self.dtype)
        h = nn.Conv(self.hidden, (self.kernel,), padding=self.kernel // 2,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden, (self.kernel,), padding=self.kernel // 2,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        return jnp.mean(h, axis=1).astype(jnp.float32)  # adaptive avg pool → 1

    @staticmethod
    def out_dim(dim: int, hidden: int) -> int:
        return hidden


class AdaptivePooling(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.mean(x, axis=1).astype(jnp.float32)

    @staticmethod
    def out_dim(dim: int, hidden: int) -> int:
        return dim


class _HoistedGRU(nn.Module):
    """GRU direction with input projections hoisted out of the scan.

    Exact nn.GRUCell math and an IDENTICAL param tree (ir/iz/in/hr/hz/hn
    under this module's name, same initializers → same seed draws), but the
    three input projections run as single batched MXU matmuls over [B,T,D]
    while the serial scan keeps only the three [B,H]x[H,H] hidden matmuls —
    the classic TPU RNN optimization (the recurrence is latency-bound, so
    shrinking per-step work shortens the serial chain)."""

    hidden: int
    dtype: Any = jnp.float32
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        H = self.hidden
        gr = nn.Dense(H, dtype=self.dtype, name="ir")(x)
        gz = nn.Dense(H, dtype=self.dtype, name="iz")(x)
        gn = nn.Dense(H, dtype=self.dtype, name="in")(x)
        ortho = nn.initializers.orthogonal()
        hr = nn.Dense(H, use_bias=False, dtype=self.dtype, kernel_init=ortho,
                      name="hr")
        hz = nn.Dense(H, use_bias=False, dtype=self.dtype, kernel_init=ortho,
                      name="hz")
        hn = nn.Dense(H, use_bias=True, dtype=self.dtype, kernel_init=ortho,
                      name="hn")
        # materialize the recurrent params, then close over the concrete
        # arrays inside lax.scan (flax modules can't be called in scan)
        probe = jnp.zeros((1, H), x.dtype)
        hr(probe), hz(probe), hn(probe)
        p = self.variables["params"]
        whr = jnp.asarray(p["hr"]["kernel"], self.dtype)
        whz = jnp.asarray(p["hz"]["kernel"], self.dtype)
        whn = jnp.asarray(p["hn"]["kernel"], self.dtype)
        bhn = jnp.asarray(p["hn"]["bias"], self.dtype)

        if self.reverse:
            gr, gz, gn = gr[:, ::-1], gz[:, ::-1], gn[:, ::-1]

        def body(h, g):
            gr_t, gz_t, gn_t = g
            r = nn.sigmoid(gr_t + h @ whr)
            z = nn.sigmoid(gz_t + h @ whz)
            n = nn.tanh(gn_t + r * (h @ whn + bhn))
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((B, H), self.dtype)
        _, ys = jax.lax.scan(
            body, h0,
            (jnp.swapaxes(gr, 0, 1), jnp.swapaxes(gz, 0, 1),
             jnp.swapaxes(gn, 0, 1)),
        )
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = ys[:, ::-1]  # keep_order semantics (original time order)
        return ys


class TemporalRNN(nn.Module):
    """rnn | lstm | gru over time via lax.scan; bidirectional concat + proj."""

    dim: int
    hidden: int = 256
    cell_type: str = "gru"  # rnn | lstm | gru
    bidirectional: bool = True
    dtype: Any = jnp.float32  # recurrence in fp32 for stability

    def _make_cell(self, name):
        if self.cell_type == "gru":
            return nn.GRUCell(features=self.hidden, dtype=self.dtype, name=name)
        if self.cell_type == "lstm":
            return nn.OptimizedLSTMCell(features=self.hidden, dtype=self.dtype,
                                        name=name)
        if self.cell_type == "rnn":
            return nn.SimpleCell(features=self.hidden, dtype=self.dtype, name=name)
        raise ValueError(f"unknown cell_type {self.cell_type!r}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        if self.cell_type == "gru":
            # hoisted scan: same params + math as nn.RNN(nn.GRUCell), less
            # serial work per step (see _HoistedGRU)
            fw = _HoistedGRU(hidden=self.hidden, dtype=self.dtype,
                             name="fw_cell")(x)
            last = fw[:, -1]
            if self.bidirectional:
                bw = _HoistedGRU(hidden=self.hidden, dtype=self.dtype,
                                 reverse=True, name="bw_cell")(x)
                last = jnp.concatenate([last, bw[:, 0]], axis=-1)
        else:
            fw = nn.RNN(self._make_cell("fw_cell"), name="fw")(x)  # [B, T, H]
            last = fw[:, -1]
            if self.bidirectional:
                bw = nn.RNN(self._make_cell("bw_cell"), reverse=True,
                            keep_order=True, name="bw")(x)
                last = jnp.concatenate([last, bw[:, 0]], axis=-1)
        out = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(last)
        return nn.relu(out).astype(jnp.float32)

    @staticmethod
    def out_dim(dim: int, hidden: int) -> int:
        return hidden


def build_temporal_head(mode: str, dim: int, *, hidden: int = 256,
                        num_heads: int = 4, max_seq_length: int = 30,
                        bidirectional: bool = True, dropout: float = 0.0,
                        dtype=jnp.bfloat16, name: str = "temporal"):
    if mode == "attention":
        return TemporalAttention(dim=dim, num_heads=num_heads,
                                 max_seq_length=max_seq_length,
                                 dropout=dropout, dtype=dtype, name=name)
    if mode == "conv":
        return TemporalConvolution(dim=dim, hidden=hidden, dtype=dtype, name=name)
    if mode == "pooling":
        return AdaptivePooling(dim=dim, dtype=dtype, name=name)
    if mode in ("rnn", "lstm", "gru"):
        return TemporalRNN(dim=dim, hidden=hidden, cell_type=mode,
                           bidirectional=bidirectional, name=name)
    raise ValueError(f"unknown temporal mode {mode!r}")


def temporal_out_dim(mode: str, dim: int, hidden: int) -> int:
    if mode in ("attention", "pooling"):
        return dim
    if mode in ("conv", "rnn", "lstm", "gru"):
        return hidden
    raise ValueError(f"unknown temporal mode {mode!r}")

"""Reference-exact temporal heads for imported torch checkpoints.

These modules reproduce — operation for operation, in fp32 — the math of the
reference's temporal aggregation modules so that a converted
``EnhancedFrameCNN`` checkpoint produces identical logits:

- ``RefTemporalAttention``: LayerNorm → +pos_encoder → torch-style packed-QKV
  multi-head self-attention → mean over T
  (/root/reference/nexar_arch.py:17-80).
- ``RefTemporalConvolution``: Conv1d+BN1d+ReLU ×2 → adaptive average pool,
  channels = feature_dim (/root/reference/nexar_arch.py:83-119).
- ``RefAdaptivePooling``: mean over T (/root/reference/nexar_arch.py:122-146).
- ``RefTemporalRNN``: LayerNorm → stacked (num_layers) optionally
  bidirectional rnn/lstm/gru → last-layer final hidden concat → projection
  back to feature_dim when dims differ (/root/reference/nexar_arch.py:149-247).

They are NOT the TPU-native performance heads (see ``temporal.py``); they
exist so the framework can consume reference training checkpoints bit-for-bit
(the AUC-parity anchor). torch defaults mirrored here: LayerNorm eps=1e-5,
BatchNorm1d eps=1e-5, GRU/LSTM gate orders (r,z,n) / (i,f,g,o).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class RefTemporalAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` semantics over [B, T, D].

    Reference order of ops (/root/reference/nexar_arch.py:52-80):
    x = LayerNorm(x); x = x + pos_encoder[:, :T]; self-attention; mean over T.
    No residual, no post-norm (unlike the native head in temporal.py).
    """

    dim: int
    num_heads: int = 4
    max_seq_length: int = 30
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, D = x.shape
        if T > self.max_seq_length:
            raise ValueError(
                f"sequence length {T} exceeds max_seq_length={self.max_seq_length}"
            )
        dh = D // self.num_heads
        x = x.astype(self.dtype)
        # torch nn.LayerNorm default eps=1e-5.
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.max_seq_length, D),
        )
        h = h + pos[:T].astype(self.dtype)

        def heads(name):
            y = nn.Dense(D, dtype=self.dtype, name=name)(h)
            return y.reshape(B, T, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1)  # [B, H, T, T]
        self.sow("intermediates", "attention_weights", attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=self.dtype, name="out")(out)
        return jnp.mean(out, axis=1).astype(jnp.float32)


class RefTemporalConvolution(nn.Module):
    """Conv1d(D→D)+BN+ReLU twice, then average pool over T.

    The reference keeps channels at feature_dim (/root/reference/
    nexar_arch.py:98-106); operates here on [B, T, D] (time-major conv).
    """

    dim: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        h = nn.Conv(self.dim, (self.kernel,), padding=self.kernel // 2,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (self.kernel,), padding=self.kernel // 2,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        return jnp.mean(h, axis=1).astype(jnp.float32)


class RefAdaptivePooling(nn.Module):
    """Mean over T (/root/reference/nexar_arch.py:122-146)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.mean(x.astype(jnp.float32), axis=1)


class RefTemporalRNN(nn.Module):
    """Stacked, optionally bidirectional rnn|lstm|gru with final-hidden concat.

    Reference semantics (/root/reference/nexar_arch.py:214-247):
    x = LayerNorm(x); multi-layer (bi)directional recurrence where layer l>0
    consumes the per-timestep concat of both directions of layer l-1; the
    pooled vector is the last layer's final hidden states, ordered (fw, bw),
    projected back to feature_dim iff hidden*directions != feature_dim.
    Inter-layer dropout is train-only in torch and thus absent here (import
    targets eval-mode parity).
    """

    dim: int
    hidden: int = 512
    cell_type: str = "gru"  # rnn | lstm | gru
    num_layers: int = 2
    bidirectional: bool = True
    dtype: Any = jnp.float32

    def _make_cell(self, name):
        if self.cell_type == "gru":
            return nn.GRUCell(features=self.hidden, dtype=self.dtype, name=name)
        if self.cell_type == "lstm":
            return nn.OptimizedLSTMCell(features=self.hidden, dtype=self.dtype,
                                        name=name)
        if self.cell_type == "rnn":
            return nn.SimpleCell(features=self.hidden, dtype=self.dtype,
                                 name=name)
        raise ValueError(f"unknown cell_type {self.cell_type!r}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        fw = bw = None
        for layer in range(self.num_layers):
            fw = nn.RNN(self._make_cell(f"l{layer}_fw_cell"),
                        name=f"l{layer}_fw")(h)  # [B, T, H]
            if self.bidirectional:
                bw = nn.RNN(self._make_cell(f"l{layer}_bw_cell"), reverse=True,
                            keep_order=True, name=f"l{layer}_bw")(h)
                h = jnp.concatenate([fw, bw], axis=-1)
            else:
                h = fw
        # Final hiddens of the LAST layer: fw state after x[T-1]; bw state
        # after consuming the reversed sequence == bw output at t=0.
        last = fw[:, -1]
        if self.bidirectional:
            last = jnp.concatenate([last, bw[:, 0]], axis=-1)
        out_dim = self.hidden * (2 if self.bidirectional else 1)
        if out_dim != self.dim:
            last = nn.Dense(self.dim, dtype=self.dtype, name="projection")(last)
        return last.astype(jnp.float32)


def build_reference_head(mode: str, dim: int, *, num_heads: int = 4,
                         kernel: int = 3, rnn_hidden: int = 512,
                         rnn_layers: int = 2, bidirectional: bool = True,
                         max_seq_length: int = 30, dtype=jnp.float32,
                         name: str = "temporal"):
    """Head factory mirroring EnhancedFrameCNN's selection
    (/root/reference/nexar_arch.py:346-371). Every mode outputs [B, dim]."""
    if mode == "attention":
        return RefTemporalAttention(dim=dim, num_heads=num_heads,
                                    max_seq_length=max_seq_length,
                                    dtype=dtype, name=name)
    if mode in ("convolution", "conv"):
        return RefTemporalConvolution(dim=dim, kernel=kernel, dtype=dtype,
                                      name=name)
    if mode == "pooling":
        return RefAdaptivePooling(dim=dim, dtype=dtype, name=name)
    if mode in ("rnn", "lstm", "gru"):
        return RefTemporalRNN(dim=dim, hidden=rnn_hidden, cell_type=mode,
                              num_layers=rnn_layers,
                              bidirectional=bidirectional, dtype=dtype,
                              name=name)
    raise ValueError(f"unknown temporal mode {mode!r}")

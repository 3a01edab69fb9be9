"""Flax MiniLM-class sentence encoder.

TPU-native replacement for the reference's torch/HF forward pass
(``vectorization.py:12-44``: HF AutoModel for
``sentence-transformers/all-MiniLM-L6-v2`` + CLS-token pooling). The
architecture is a standard BERT encoder at MiniLM-L6 scale (6 layers, hidden
384, 12 heads, FFN 1536, vocab 30522, max position 512) expressed in
flax.linen so the whole embed step jits into one XLA program:

- attention and FFN matmuls hit the MXU in bf16 (configurable) with fp32
  layernorm/softmax accumulation;
- attention mask is additive (no dynamic shapes — padded batches);
- pooling ("cls" | "mean") happens inside the jitted program, so only the
  (B, 384) pooled output crosses back to host (the reference ships the whole
  last_hidden_state through ``.cpu().numpy()``, ``vectorization.py:44``).

Weights convert 1:1 from the HF torch checkpoint (models/convert.py) when a
cache is present; otherwise deterministic random init keeps the framework
fully functional offline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    dtype: str = "float32"  # compute dtype: "float32" or "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class Embeddings(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=c.compute_dtype)(input_ids)
        pos_ids = jnp.arange(input_ids.shape[-1])[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=c.compute_dtype)(pos_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings", dtype=c.compute_dtype)(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm")(x)
        x = nn.Dropout(c.dropout_rate)(x, deterministic=deterministic)
        return x.astype(c.compute_dtype)


class SelfAttention(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.DenseGeneral(
            (c.num_heads, head_dim), axis=-1, name=name, dtype=c.compute_dtype
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        scale = head_dim ** -0.5
        # (B, H, T, T) logits accumulate in fp32 for a stable softmax.
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.compute_dtype)
        probs = nn.Dropout(c.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v)
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), name="output",
                              dtype=c.compute_dtype)(ctx)
        return out


class Layer(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        c = self.cfg
        attn = SelfAttention(c, name="attention")(x, attn_bias, deterministic)
        attn = nn.Dropout(c.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="attention_norm")(x + attn).astype(c.compute_dtype)
        h = nn.Dense(c.intermediate_size, name="intermediate",
                     dtype=c.compute_dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="ffn_output", dtype=c.compute_dtype)(h)
        h = nn.Dropout(c.dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="ffn_norm")(x + h).astype(c.compute_dtype)
        return x


class MiniLMEncoder(nn.Module):
    """BERT-style encoder producing pooled sentence embeddings."""

    cfg: MiniLMConfig = MiniLMConfig()

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        *,
        pooling: str = "cls",
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = Embeddings(c, name="embeddings")(input_ids, token_type_ids,
                                             deterministic)
        # additive mask: 0 for real tokens, large-negative for padding
        attn_bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)
        for i in range(c.num_layers):
            x = Layer(c, name=f"layer_{i}")(x, attn_bias, deterministic)
        hidden = x.astype(jnp.float32)
        if pooling == "cls":
            # reference uses CLS-token pooling (vectorization.py:44)
            return hidden[:, 0]
        if pooling == "mean":
            mask = attention_mask[..., None].astype(jnp.float32)
            return (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-9)
        raise ValueError(f"unknown pooling {pooling!r}")

    def init_params(self, rng: jax.Array, max_len: int = 8):
        ids = jnp.zeros((1, max_len), jnp.int32)
        return self.init(rng, ids, jnp.ones_like(ids))["params"]

"""CLIP ViT-L/14 text encoder (SD v1.5's frozen text tower) in Flax.

Frozen in the reference (``multiview_runner.py:145``); needed for caption
conditioning and for initializing the bbox-embedder class tokens with pooled
class-name embeddings (reference ``bbox_embedder.py:132-145``).
quick-GELU activation, causal mask, final LN; pooled output = hidden state at
the argmax(input_ids) position (EOT token has the highest id in CLIP BPE).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h, d = self.num_heads, self.hidden_size // self.num_heads
        b, l, _ = x.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, l, h, d)
        k = k.reshape(b, l, h, d)
        v = v.reshape(b, l, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        logits = jnp.where(mask[None, None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, -1)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads,
                              dtype=self.dtype, name="self_attn")(
            y.astype(self.dtype), mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        y = nn.Dense(self.intermediate_size, dtype=self.dtype, name="mlp_fc1")(
            y.astype(self.dtype))
        y = quick_gelu(y)
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        """input_ids (B, L) int32 -> (last_hidden_state (B, L, D),
        pooler_output (B, D))."""
        b, l = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_position_embeddings, self.hidden_size))
        x = tok + pos[None, :l].astype(tok.dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        for i in range(self.num_layers):
            x = CLIPLayer(self.hidden_size, self.num_heads,
                          self.intermediate_size, dtype=self.dtype,
                          name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="final_layer_norm")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        return x, pooled

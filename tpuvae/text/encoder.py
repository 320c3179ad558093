"""Multilingual sentence encoder as a JAX inference graph.

Capability match of C8: the reference embeds lyrics with
``SentenceTransformer('paraphrase-multilingual-mpnet-base-v2')`` →
(N, 768) (``1_preprocessing_advanced.py:327-341``).  That model is an
XLM-RoBERTa-base encoder (12 layers, hidden 768, heads 12, vocab 250002)
with attention-masked mean pooling.  This module implements the same
architecture as a flax model so inference runs batched on TPU; weights
convert once from a HuggingFace torch checkpoint via
:func:`convert_hf_state_dict` (this build environment has no network, so
tests run the graph with random weights and the pipeline falls back to the
hashing embedder in ``tpuvae.text.hashing`` when no checkpoint is present).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250002
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


class TransformerLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        attn = nn.MultiHeadDotProductAttention(
            num_heads=c.heads, qkv_features=c.hidden, name="attention"
        )(x, x, mask=mask[:, None, None, :])
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + attn)
        h = nn.Dense(c.intermediate, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn_ln")(x + h)


class SentenceEncoder(nn.Module):
    """Token ids + mask → mean-pooled 768-d sentence embeddings."""

    cfg: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        # XLM-R position ids: pad-aware offset from pad_token_id + 1
        positions = (
            jnp.cumsum(attention_mask, axis=1) * attention_mask + c.pad_token_id
        ).astype(jnp.int32)
        x = nn.Embed(c.vocab_size, c.hidden, name="word_emb")(input_ids)
        x = x + nn.Embed(c.max_positions, c.hidden, name="pos_emb")(positions)
        x = x + nn.Embed(c.type_vocab, c.hidden, name="type_emb")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)
        for i in range(c.layers):
            x = TransformerLayer(c, name=f"layer_{i}")(x, attention_mask)
        # attention-masked mean pooling (sentence-transformers default)
        m = attention_mask[..., None].astype(x.dtype)
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)


def infer_encoder_config(state_dict: dict,
                         hf_config: dict | None = None) -> EncoderConfig:
    """Encoder geometry from a checkpoint's weight shapes.

    vocab/hidden/layers/intermediate/max_positions/type_vocab are all
    determined by shapes.  ``heads`` is NOT recoverable from shapes (the
    per-head split is a reshape): pass the checkpoint's ``config.json``
    dict as ``hf_config`` to use its ``num_attention_heads``; without it
    the XLM-R family's 64-d head convention is assumed (768 hidden ->
    12 heads).  Lets the checkpoint path run any XLM-R-family size, not
    just the 278 M-param base.
    """
    import re

    def g(key):
        for prefix in ("", "roberta.", "0.auto_model."):
            k = prefix + key
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(key)

    vocab, hidden = g("embeddings.word_embeddings.weight").shape
    layers = 1 + max(
        int(m.group(1))
        for k in state_dict
        if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
    )
    heads = int((hf_config or {}).get("num_attention_heads", 0)) or max(
        1, int(hidden) // 64
    )
    if hidden % heads:
        raise ValueError(
            f"hidden={hidden} not divisible by heads={heads}; supply the "
            f"checkpoint's config.json (num_attention_heads) next to "
            f"pytorch_model.bin"
        )
    return EncoderConfig(
        vocab_size=int(vocab),
        hidden=int(hidden),
        layers=layers,
        heads=heads,
        intermediate=int(g("encoder.layer.0.intermediate.dense.weight").shape[0]),
        max_positions=int(g("embeddings.position_embeddings.weight").shape[0]),
        type_vocab=int(g("embeddings.token_type_embeddings.weight").shape[0]),
    )


def convert_hf_state_dict(state_dict: dict, cfg: EncoderConfig = EncoderConfig()):
    """Map a HuggingFace XLM-RoBERTa torch state_dict onto SentenceEncoder
    params.  Accepts numpy-convertible tensors keyed in the standard
    ``roberta.*`` / ``embeddings.*`` naming."""

    def g(key):
        for prefix in ("", "roberta.", "0.auto_model."):
            k = prefix + key
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(key)

    h, heads = cfg.hidden, cfg.heads
    head_dim = h // heads
    params = {
        "word_emb": {"embedding": g("embeddings.word_embeddings.weight")},
        "pos_emb": {"embedding": g("embeddings.position_embeddings.weight")},
        "type_emb": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "emb_ln": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(cfg.layers):
        p = f"encoder.layer.{i}."

        def qkv(name):
            w = g(p + f"attention.self.{name}.weight").T  # (h, h) in-major
            b = g(p + f"attention.self.{name}.bias")
            return {
                "kernel": w.reshape(h, heads, head_dim),
                "bias": b.reshape(heads, head_dim),
            }

        params[f"layer_{i}"] = {
            "attention": {
                "query": qkv("query"),
                "key": qkv("key"),
                "value": qkv("value"),
                "out": {
                    "kernel": g(p + "attention.output.dense.weight").T.reshape(
                        heads, head_dim, h
                    ),
                    "bias": g(p + "attention.output.dense.bias"),
                },
            },
            "attn_ln": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "ffn_in": {
                "kernel": g(p + "intermediate.dense.weight").T,
                "bias": g(p + "intermediate.dense.bias"),
            },
            "ffn_out": {
                "kernel": g(p + "output.dense.weight").T,
                "bias": g(p + "output.dense.bias"),
            },
            "ffn_ln": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    return {"params": params}

"""Lyrics → (N, 768) embedding front-end with backend selection.

Capability match of ``create_lyrics_embeddings``
(``1_preprocessing_advanced.py:327-341``): coerces empty lyrics to ``' '``,
batches the encode.  Backend resolution order:

  1. ``checkpoint`` path (or $TPUVAE_TEXT_CHECKPOINT) — a HuggingFace
     XLM-RoBERTa torch state_dict + sentencepiece tokenizer; runs the flax
     :class:`~tpuvae.text.encoder.SentenceEncoder` graph on device.
  2. hashing fallback (deterministic, offline).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from tpuvae.text.hashing import embed_texts


def create_lyrics_embeddings(
    lyrics_list,
    *,
    checkpoint: str | None = None,
    batch_size: int = 32,
) -> np.ndarray:
    lyrics_cleaned = [
        str(l) if l is not None and len(str(l)) > 0 else " " for l in lyrics_list
    ]
    checkpoint = checkpoint or os.environ.get("TPUVAE_TEXT_CHECKPOINT")
    if checkpoint and Path(checkpoint).exists():
        return _encode_with_checkpoint(lyrics_cleaned, checkpoint, batch_size)
    return embed_texts(lyrics_cleaned)


def _encode_with_checkpoint(texts, checkpoint: str, batch_size: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    import torch

    from tpuvae.text.encoder import EncoderConfig, SentenceEncoder, convert_hf_state_dict

    state_dict = torch.load(
        Path(checkpoint) / "pytorch_model.bin", map_location="cpu",
        weights_only=True,
    )
    cfg = EncoderConfig()
    variables = convert_hf_state_dict(
        {k: v.numpy() for k, v in state_dict.items()}, cfg
    )
    model = SentenceEncoder(cfg)
    encode = jax.jit(lambda ids, mask: model.apply(variables, ids, mask))

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(checkpoint)
    out = []
    for i in range(0, len(texts), batch_size):
        batch = tok(
            texts[i : i + batch_size],
            padding="max_length", truncation=True, max_length=128,
            return_tensors="np",
        )
        emb = encode(
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
        )
        out.append(np.asarray(emb))
    return np.concatenate(out).astype(np.float32)

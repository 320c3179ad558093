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


def embed_lyrics(
    lyrics_list,
    *,
    checkpoint: str | None = None,
    batch_size: int = 32,
) -> tuple[np.ndarray, str]:
    """Embed lyrics; returns ``(embeddings, backend_name)``.

    ``backend_name`` is recorded into the saved artifact metadata so
    downstream results are attributable (a hashed-ngram fallback is NOT
    semantically equivalent to the reference's sentence-transformer,
    ``1_preprocessing_advanced.py:327-341``).  An explicitly requested
    checkpoint (argument or $TPUVAE_TEXT_CHECKPOINT) that does not exist is
    an error, never a silent fallback.
    """
    lyrics_cleaned = [
        str(l) if l is not None and len(str(l)) > 0 else " " for l in lyrics_list
    ]
    checkpoint = checkpoint or os.environ.get("TPUVAE_TEXT_CHECKPOINT")
    if checkpoint:
        if not Path(checkpoint).exists():
            raise FileNotFoundError(
                f"lyrics-encoder checkpoint {checkpoint!r} does not exist "
                f"(from the `checkpoint` argument or $TPUVAE_TEXT_CHECKPOINT); "
                f"unset it to use the offline hashed-ngram fallback"
            )
        emb = _encode_with_checkpoint(lyrics_cleaned, checkpoint, batch_size)
        return emb, f"xlmr-checkpoint:{Path(checkpoint).name}"
    return embed_texts(lyrics_cleaned), "hashed-ngram"


def create_lyrics_embeddings(
    lyrics_list,
    *,
    checkpoint: str | None = None,
    batch_size: int = 32,
) -> np.ndarray:
    return embed_lyrics(
        lyrics_list, checkpoint=checkpoint, batch_size=batch_size
    )[0]


def _encode_with_checkpoint(texts, checkpoint: str, batch_size: int) -> np.ndarray:
    """Run the flax XLM-R graph on checkpoint weights.

    First-party end to end: tokenization is
    :class:`tpuvae.text.tokenizer.XlmRobertaTokenizer` (a sentencepiece
    reader + Viterbi segmenter — no ``transformers`` dependency); torch is
    imported only to deserialize the checkpoint's weight file once.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from tpuvae.text.encoder import (
        SentenceEncoder,
        convert_hf_state_dict,
        infer_encoder_config,
    )
    from tpuvae.text.tokenizer import XlmRobertaTokenizer, find_sentencepiece_model

    state_dict = torch.load(
        Path(checkpoint) / "pytorch_model.bin", map_location="cpu",
        weights_only=True,
    )
    sd_np = {k: v.numpy() for k, v in state_dict.items()}
    cfg_json = Path(checkpoint) / "config.json"
    hf_config = None
    if cfg_json.exists():
        import json

        hf_config = json.loads(cfg_json.read_text())
    cfg = infer_encoder_config(sd_np, hf_config)  # any XLM-R-family size
    variables = convert_hf_state_dict(sd_np, cfg)
    model = SentenceEncoder(cfg)
    encode = jax.jit(lambda ids, mask: model.apply(variables, ids, mask))

    spm = find_sentencepiece_model(checkpoint)
    if spm is None:
        raise FileNotFoundError(
            f"no sentencepiece model (*.model) in checkpoint dir {checkpoint!r}"
        )
    tok = XlmRobertaTokenizer(spm)
    # position ids run to seq_len + pad_token_id + 1 — stay inside the
    # checkpoint's position table whatever its size
    max_len = min(128, cfg.max_positions - cfg.pad_token_id - 1)
    out = []
    for i in range(0, len(texts), batch_size):
        batch = tok(texts[i : i + batch_size], max_length=max_len)
        emb = encode(
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
        )
        out.append(np.asarray(emb))
    return np.concatenate(out).astype(np.float32)

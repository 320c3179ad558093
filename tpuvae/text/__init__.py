from tpuvae.text.hashing import embed_text, embed_texts  # noqa: F401
from tpuvae.text.encoder import (  # noqa: F401
    EncoderConfig,
    SentenceEncoder,
    convert_hf_state_dict,
    infer_encoder_config,
)
from tpuvae.text.embedder import (  # noqa: F401
    create_lyrics_embeddings,
    embed_lyrics,
)

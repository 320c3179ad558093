from tpuvae.text.hashing import embed_text, embed_texts  # noqa: F401
from tpuvae.text.encoder import (  # noqa: F401
    EncoderConfig,
    SentenceEncoder,
    convert_hf_state_dict,
)
from tpuvae.text.embedder import create_lyrics_embeddings  # noqa: F401

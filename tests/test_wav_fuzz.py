"""Robustness fuzz: the WAV decoders must fail cleanly (ValueError/IOError),
never crash or hang, on malformed inputs."""

import struct

import numpy as np
import pytest

from tpuvae.io import native_loader
from tpuvae.io.wav import read_wav


def _cases(tmp_path):
    rng = np.random.default_rng(0)
    cases = {}
    cases["random_bytes"] = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
    cases["empty"] = b""
    cases["riff_only"] = b"RIFF\x00\x00\x00\x00WAVE"
    # fmt without data
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    cases["no_data"] = b"RIFF" + struct.pack("<I", 4 + len(fmt)) + b"WAVE" + fmt
    # data chunk claiming more bytes than present
    data = b"data" + struct.pack("<I", 10_000) + b"\x00" * 8
    cases["truncated_data"] = (
        b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    )
    # zero channels
    fmt0 = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    cases["zero_channels"] = (
        b"RIFF" + struct.pack("<I", 4 + len(fmt0) + 12) + b"WAVE" + fmt0
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    # unsupported compression code
    fmtc = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)
    cases["mp3_code"] = (
        b"RIFF" + struct.pack("<I", 4 + len(fmtc) + 12) + b"WAVE" + fmtc
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    # extensible without GUID bytes
    fmte = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    cases["extensible_no_guid"] = (
        b"RIFF" + struct.pack("<I", 4 + len(fmte) + 12) + b"WAVE" + fmte
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    paths = {}
    for name, blob in cases.items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(blob)
        paths[name] = p
    return paths


def test_python_decoder_fails_cleanly(tmp_path):
    for name, p in _cases(tmp_path).items():
        if name == "truncated_data":
            # lenient short decode (like soundfile): whatever bytes exist
            x, sr = read_wav(p)
            assert x.shape[0] <= 10_000 and sr == 8000
            continue
        with pytest.raises((ValueError, IOError)):
            read_wav(p)


def test_native_decoder_fails_cleanly(tmp_path):
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    for name, p in _cases(tmp_path).items():
        if name == "truncated_data":
            # lenient short decode, zero-padded (matches the Python decoder)
            out = native_loader.load_audio_native(p, 8000, 0.5)
            assert out.shape == (4000,)
            continue
        with pytest.raises((IOError, RuntimeError)):
            native_loader.load_audio_native(p, 8000, 0.5)


def _wav_blob(audio_format, bits, payload, sr=8000, channels=1):
    import struct

    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sr, sr * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@pytest.mark.parametrize("depth", ["u8", "i24", "i32", "f32", "f64"])
def test_python_reader_all_sample_formats(tmp_path, depth):
    """Every documented sample format of the pure-Python fallback reader
    (the path used when the C++ codec is not built) decodes to the same
    float signal within its quantization step."""
    rng = np.random.default_rng(4)
    x = (rng.uniform(-0.95, 0.95, 64)).astype(np.float64)
    if depth == "u8":
        payload = ((x * 128.0) + 128.0).clip(0, 255).astype(np.uint8).tobytes()
        blob, tol = _wav_blob(1, 8, payload), 1.0 / 128
    elif depth == "i24":
        v = np.round(x * (1 << 23)).astype(np.int64)
        b = np.zeros((64, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        blob, tol = _wav_blob(1, 24, b.tobytes()), 2.0 / (1 << 23)
    elif depth == "i32":
        payload = np.round(x * (1 << 31)).clip(-(1 << 31), (1 << 31) - 1
                                                ).astype("<i4").tobytes()
        blob, tol = _wav_blob(1, 32, payload), 2.0 / (1 << 31)
    elif depth == "f32":
        blob, tol = _wav_blob(3, 32, x.astype("<f4").tobytes()), 1e-6
    else:
        blob, tol = _wav_blob(3, 64, x.astype("<f8").tobytes()), 1e-12
    p = tmp_path / f"{depth}.wav"
    p.write_bytes(blob)
    y, sr = read_wav(p)
    assert sr == 8000 and y.shape == (64, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=tol)
    # negative 24-bit values exercised the sign extension
    if depth == "i24":
        assert (y < 0).any()


def test_python_reader_rejects_unknown_depth(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(_wav_blob(1, 12, b"\0" * 24))
    with pytest.raises(ValueError, match="bit depth"):
        read_wav(p)

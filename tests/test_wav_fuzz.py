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

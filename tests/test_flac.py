"""First-party FLAC codec: Python decoder vs native decoder vs encoder
round-trips, loader dispatch, catalog pickup, and malformed-input fuzz.

The reference's ``librosa.load`` (``src/1_preprocessing.py:137-153``)
decodes FLAC through third-party libsndfile; here both decoders are
first-party (``tpuvae/io/flac.py``, ``native/flac.cpp``) and must agree
bit-exactly on every stream the first-party encoder can produce.
"""

import numpy as np
import pytest

from tpuvae.io import native_loader
from tpuvae.io.flac import read_flac, write_flac
from tpuvae.io.wav import load_audio

STEREO_MODES = ["independent", "left_side", "right_side", "mid_side"]
SUBFRAMES = [None, "verbatim", "lpc"]


def _stereo_signal(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 22050.0
    base = (np.sin(2 * np.pi * 220 * t) * 12000
            + rng.normal(0, 300, n)).astype(np.int64)
    left = np.clip(base, -32768, 32767)
    right = np.clip(base // 2 + rng.integers(-200, 200, n), -32768, 32767)
    return np.stack([left, right], 1)


@pytest.mark.parametrize("stereo", STEREO_MODES)
@pytest.mark.parametrize("subframe", SUBFRAMES)
def test_python_roundtrip_bit_exact(tmp_path, stereo, subframe):
    x = _stereo_signal()
    p = tmp_path / "t.flac"
    write_flac(p, x, 22050, 16, block_size=2048, subframe=subframe,
               stereo=stereo)
    y, sr = read_flac(p)
    assert sr == 22050
    got = np.round(y * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize("stereo", STEREO_MODES)
def test_native_matches_python(tmp_path, stereo):
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    x = _stereo_signal(seed=3)
    p = tmp_path / "n.flac"
    write_flac(p, x, 22050, 16, stereo=stereo)
    dur = x.shape[0] / 22050.0
    py = load_audio(p, 22050, dur, prefer_native=False)
    nat = native_loader.load_audio_native(p, 22050, dur)
    np.testing.assert_allclose(nat, py, atol=2e-7)
    # and both equal the true mono mixdown of the encoded samples
    ref = (x.mean(1) / 32768.0).astype(np.float32)
    np.testing.assert_allclose(nat, ref, atol=2e-7)


def test_load_audio_dispatches_on_magic(tmp_path):
    """load_audio must decode .flac through the FLAC path (magic bytes, not
    extension) with truncate/pad semantics identical to the WAV path."""
    x = _stereo_signal(n=4000, seed=5)
    p = tmp_path / "clip.flac"
    write_flac(p, x, 22050, 16)
    y = load_audio(p, 22050, 1.0, prefer_native=False)  # pad to 22050
    assert y.shape == (22050,) and y.dtype == np.float32
    assert np.abs(y[:4000]).max() > 0 and np.abs(y[4000:]).max() == 0


def test_mono_constant_and_24bit(tmp_path):
    c = np.full(3000, -123, np.int64)
    p = tmp_path / "c.flac"
    write_flac(p, c, 8000, 16, block_size=1024)
    y, sr = read_flac(p)
    assert sr == 8000
    np.testing.assert_array_equal(
        np.round(y[:, 0] * 32768).astype(np.int64), c)

    rng = np.random.default_rng(7)
    x24 = rng.normal(0, 1e6, (2000, 1)).astype(np.int64)
    x24 = x24.clip(-(1 << 23), (1 << 23) - 1)
    p24 = tmp_path / "b.flac"
    write_flac(p24, x24, 48000, 24, block_size=512)
    y, sr = read_flac(p24)
    assert sr == 48000
    np.testing.assert_array_equal(
        np.round(y * (1 << 23)).astype(np.int64), x24)


def test_catalog_collects_flac(tmp_path):
    """The dataset walker accepts .flac clips alongside .wav."""
    import pandas as pd

    from tpuvae.io.catalog import collect_audio_files

    d = tmp_path / "English_Datasets" / "rock"
    d.mkdir(parents=True)
    write_flac(d / "song1.flac", _stereo_signal(n=2000), 22050, 16)
    pd.DataFrame(
        {"ID": ["song1"], "genre": ["rock"], "lyrics": ["hello world " * 3]}
    ).to_csv(tmp_path / "meta.csv", index=False)
    files, skipped = collect_audio_files(
        tmp_path, tmp_path / "meta.csv", strict=False)
    assert len(files) == 1 and files[0].path.endswith("song1.flac")


def test_synth_dataset_flac_container(tmp_path):
    """generate_dataset(container='mixed') writes both containers and the
    catalog + loader consume them interchangeably."""
    from tpuvae.io.catalog import collect_audio_files
    from tpuvae.io.synthetic import generate_dataset

    meta = generate_dataset(tmp_path, clips_per_genre_lang=2,
                            genres=("rock",), duration=0.2,
                            container="mixed")
    files, _ = collect_audio_files(tmp_path, meta, strict=False)
    exts = {f.path.rsplit(".", 1)[-1] for f in files}
    assert exts == {"wav", "flac"}, exts
    for f in files:
        y = load_audio(f.path, 22050, 0.2, prefer_native=False)
        assert y.shape == (4410,) and np.isfinite(y).all()


def test_corrupt_flac_fails_cleanly(tmp_path):
    """Bit flips and truncations anywhere in the stream must raise (CRC or
    parse error) in the Python decoder and return an error (never crash)
    in the native one."""
    x = _stereo_signal(n=3000, seed=11)
    p = tmp_path / "good.flac"
    write_flac(p, x, 22050, 16, block_size=1024)
    blob = bytearray(p.read_bytes())
    rng = np.random.default_rng(0)

    cases = {}
    for i in range(12):
        mut = bytearray(blob)
        pos = int(rng.integers(4, len(mut)))
        mut[pos] ^= int(rng.integers(1, 256))
        cases[f"flip_{i}"] = bytes(mut)
    for i, frac in enumerate((0.1, 0.5, 0.9)):
        cases[f"trunc_{i}"] = bytes(blob[: int(len(blob) * frac)])
    cases["magic_only"] = b"fLaC"
    cases["empty_meta"] = b"fLaC" + b"\x80\x00\x00\x00"

    native_ok = native_loader.native_available()
    for name, payload in cases.items():
        bad = tmp_path / f"{name}.flac"
        bad.write_bytes(payload)
        try:
            y, _ = read_flac(bad)
            # a flip in pure padding/unverified bytes may decode; if it
            # does, the output must still be finite and sane
            assert np.isfinite(y).all()
        except (ValueError, IndexError):
            pass
        if native_ok:
            try:
                native_loader.load_audio_native(bad, 22050, 0.2)
            except (IOError, OSError):
                pass


def test_utf8_frame_numbers_all_widths():
    """FLAC's extended-UTF-8 frame/sample-number coding round-trips at
    every encoded width (1-7 bytes; 36-bit sample numbers are legal in
    variable-blocksize streams), and malformed bytes raise."""
    from tpuvae.io.flac import _BitReader, _read_utf8_number, _utf8_number

    vals = [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
            0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF, (1 << 36) - 1]
    for v in vals:
        enc = _utf8_number(v)
        assert _read_utf8_number(_BitReader(enc)) == v, hex(v)
    with pytest.raises(ValueError, match="invalid UTF-8"):
        _read_utf8_number(_BitReader(b"\xff\x80"))          # bad lead byte
    with pytest.raises(ValueError, match="continuation"):
        _read_utf8_number(_BitReader(b"\xc2\x00"))          # bad follow byte


def test_many_frames_multibyte_frame_numbers(tmp_path):
    """>128 frames forces multi-byte frame-number coding in every later
    frame header; the stream must still decode bit-exactly."""
    rng = np.random.default_rng(3)
    x = (rng.integers(-2000, 2000, size=20000)).astype(np.int32)
    p = tmp_path / "many.flac"
    write_flac(p, x, 22050, block_size=128)     # 157 frames
    y, sr = read_flac(p)
    assert sr == 22050
    np.testing.assert_array_equal(np.asarray(y).ravel(),
                                  (x / 32768.0).astype(np.float32))

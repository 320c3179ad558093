"""Shared fixtures.  CPU/8-virtual-device setup lives in _tpuvae_pytest_cpu
(loaded via pytest.ini addopts before capture starts)."""

import os
import sys

import numpy as np
import pytest

if os.environ.get("TPUVAE_LINECOV") == "1":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import linecov

    linecov.start()

    def pytest_unconfigure(config):
        linecov.print_summary(linecov.stop_and_report(), min_missing=10)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def audio_batch(rng):
    """Small batch of synthetic 1-second clips: tones, chirp, noise, silence."""
    sr = 22050
    t = np.arange(sr) / sr
    clips = [
        0.5 * np.sin(2 * np.pi * 440.0 * t),
        0.3 * np.sin(2 * np.pi * 220.0 * t) + 0.2 * np.sin(2 * np.pi * 3301.0 * t),
        0.4 * np.sin(2 * np.pi * (200.0 + 1500.0 * t) * t),  # chirp
        rng.standard_normal(sr).astype(np.float64) * 0.1,
        np.zeros(sr),
    ]
    return np.stack(clips).astype(np.float32), sr

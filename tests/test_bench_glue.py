"""Smoke tests for the bench.py extra-metric builders (VERDICT r3 #2).

Round 3 shipped two bench-only bugs that no test caught because the glue
between bench.py and the library only ran on real TPU at bench time:
``extract_advanced`` was fed the basic ``PreprocessConfig`` (missing
``fixed_time_steps`` → AttributeError) and ``SimpleVAE(dtype=...)`` raised
TypeError.  These tests run every builder bench.py's ``_extra_metrics``
composes — both extraction extras and every (model, dtype) train-step
combination — on the CPU harness with tiny shapes, so bench glue can never
again break only at bench time.
"""

import sys
from dataclasses import replace
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "benchmarks"))

from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
from tpuvae.dsp import (
    extract_advanced,
    extract_basic_features,
    jit_extractor,
    resolve_numerics,
)


def _tiny_clips(n=2, seconds=1.0, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, int(seconds * sr))).astype(np.float32)


def _run_extraction(feature_fn, cfg):
    """Mirror bench.py::_extraction at tiny geometry."""
    clips = _tiny_clips()
    _, method = resolve_numerics(cfg)
    if method == "ct_pallas":
        from tpuvae.ops.stft import waveform_to_hop_rows_np

        fn = jit_extractor(feature_fn, cfg, num_samples=clips.shape[1])
        xs = np.stack([waveform_to_hop_rows_np(c, cfg.n_fft, cfg.hop_length)
                       for c in clips])
    else:
        fn = jit_extractor(feature_fn, cfg)
        xs = clips
    out = fn(xs)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "extractor returned no arrays"
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf)))
    return out


def test_bench_exact_extraction_builder():
    cfg = replace(PreprocessConfig(), precision_mode="exact")
    _run_extraction(extract_basic_features, cfg)


def test_bench_advanced_extraction_builder():
    # exactly the config bench.py::_extract_advanced constructs: an
    # AdvancedPreprocessConfig carrying the basic cfg's numerics knobs
    cfg = PreprocessConfig()
    adv = AdvancedPreprocessConfig(
        precision_mode=cfg.precision_mode, stft_method=cfg.stft_method,
        extract_batch=cfg.extract_batch,
    )
    _run_extraction(extract_advanced, adv)


@pytest.mark.parametrize("model,dtype", [
    ("simple", "bfloat16"),
    ("cvae", "bfloat16"),
    ("hybrid", "bfloat16"),
    ("hybrid", "float32"),
])
def test_bench_train_builder(model, dtype):
    """Every (model, dtype) pair bench.py times must build + step."""
    from train_step_profile import build_train_setup

    step, state, batches, key = build_train_setup(model, dtype, batch=4)
    state, loss = step(state, batches[0], key)
    assert np.isfinite(np.asarray(loss))


def test_bench_importable_and_extras_fenced():
    """bench.py must import, and its extras block must be fenced so an
    exception can never kill the measured headline."""
    import ast

    src = (REPO / "bench.py").read_text()
    tree = ast.parse(src)
    # find the `result["extra"] = _extra_metrics(...)` assignment and check
    # it sits inside a try/except
    fenced = False
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            for sub in ast.walk(node):
                if (isinstance(sub, ast.Call)
                        and isinstance(sub.func, ast.Name)
                        and sub.func.id == "_extra_metrics"):
                    fenced = True
    assert fenced, "result['extra'] assignment is not inside try/except"


# --- round-5 driver-record plumbing (VERDICT r4 #1) --------------------------

def _import_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_prior_records_parse():
    """_prior_records must read every BENCH_r*.json in the repo without
    raising, oldest first, and surface their extra dicts."""
    bench = _import_bench()
    recs = bench._prior_records()
    stems = [s for s, _ in recs]
    assert stems == sorted(stems)
    for _, extra in recs:
        assert isinstance(extra, dict)


def test_bench_never_recorded_extras_run_first():
    bench = _import_bench()
    records = [("BENCH_r03", {"a": 1.0, "c": {"value": 2.0, "stale": True,
                                              "source": "BENCH_r02"}})]
    recorded = bench._fresh_keys_ever_recorded(records)
    assert recorded == {"a"}          # stale carry-forwards don't count
    blocks = [("a", None), ("b", None), ("c", None)]
    ordered = [n for n, _ in bench._order_blocks(blocks, recorded)]
    assert ordered == ["b", "c", "a"]


def test_bench_stale_carry_forward():
    bench = _import_bench()
    records = [
        ("BENCH_r02", {"x": 10.0, "y": 5.0}),
        ("BENCH_r03", {"x": 11.0,
                       "y": {"value": 5.0, "stale": True,
                             "source": "BENCH_r02"}}),
    ]
    extra = {"x": 12.0}    # x measured fresh this run; y was budget-cut
    carried = bench._carry_stale(extra, records)
    assert extra["x"] == 12.0                       # fresh value untouched
    assert extra["y"] == {"value": 5.0, "stale": True,
                          "source": "BENCH_r02"}    # original provenance kept
    assert carried == [("y", "BENCH_r02")]

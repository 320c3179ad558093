"""Pallas kernels vs the XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpuvae.metrics.pairwise import self_distances, squared_distances
from tpuvae.ops import self_distances_pallas, squared_distances_pallas


def test_pairwise_kernel_matches_xla():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 37)).astype(np.float32)   # non-multiple shapes
    y = rng.normal(size=(77, 37)).astype(np.float32)
    got = np.asarray(squared_distances_pallas(x, y, tile_n=64, tile_m=64))
    want = np.asarray(squared_distances(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_self_distances_kernel_zero_diag():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(130, 8)).astype(np.float32)
    got = np.asarray(self_distances_pallas(x, tile_n=64, tile_m=64))
    want = np.asarray(self_distances(jnp.asarray(x)))
    assert (np.diag(got) == 0).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_feeds_silhouette():
    """The kernel's output is a drop-in distance matrix for the metrics."""
    from sklearn.metrics import silhouette_score as sk_sil

    from tpuvae.metrics import compact_labels, silhouette_from_distances

    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.normal(-2, 0.5, (40, 5)), rng.normal(2, 0.5, (40, 5)),
    ]).astype(np.float32)
    labels = np.repeat([0, 1], 40)
    lab, k = compact_labels(labels)
    d = self_distances_pallas(x, tile_n=64, tile_m=64)
    got = float(silhouette_from_distances(d, jnp.asarray(lab), k))
    want = sk_sil(x, labels)
    assert abs(got - want) < 1e-4


def test_pallas_stft_matches_dft_path():
    from tpuvae.dsp import stft_power
    from tpuvae.ops.stft import stft_power_pallas

    rng = np.random.default_rng(0)
    y = rng.standard_normal((3, 44100)).astype(np.float32) * 0.3
    got = np.asarray(stft_power_pallas(jnp.asarray(y)))
    want = np.asarray(stft_power(jnp.asarray(y), method="dft"))
    assert got.shape == want.shape == (3, 1025, 87)
    # on TPU the two paths use different MXU pass structures; a handful of
    # near-zero bins reach ~1% relative (sub-0.05 dB after the log)
    np.testing.assert_allclose(got, want, rtol=2e-2,
                               atol=1e-3 * float(want.max()))
    # via the stft_power method switch
    got2 = np.asarray(stft_power(jnp.asarray(y), method="pallas"))
    np.testing.assert_array_equal(got, got2)


def test_pallas_stft_rejects_bad_hop():
    import pytest as _pytest

    from tpuvae.ops.stft import stft_power_pallas

    with _pytest.raises(ValueError, match="hop"):
        stft_power_pallas(jnp.zeros((1, 4096)), n_fft=2048, hop_length=500)


def test_masked_median_pallas_matches_reference():
    import jax.numpy as jnp

    from tpuvae.dsp.chroma import _masked_median
    from tpuvae.ops.select import masked_median_batch

    rng = np.random.default_rng(3)
    vals = rng.normal(size=(5, 1000)).astype(np.float32) * 100
    mask = rng.random((5, 1000)) < 0.3
    mask[3] = False           # empty mask → 0.0
    mask[4, :1] = True        # single element
    mask[4, 1:] = False
    got = np.asarray(masked_median_batch(jnp.asarray(vals), jnp.asarray(mask)))
    want = np.asarray([
        _masked_median(jnp.asarray(vals[i]), jnp.asarray(mask[i]))
        for i in range(5)
    ])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # also against numpy median directly
    for i in range(3):
        np.testing.assert_allclose(got[i], np.median(vals[i][mask[i]]),
                                   rtol=1e-6)


def test_fused_tuning_kernel_matches_staged_path():
    import jax
    import jax.numpy as jnp

    import tpuvae.dsp.chroma as C
    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.tuning import estimate_tuning_pallas

    rng = np.random.default_rng(11)
    t = np.arange(44100) / 22050.0
    clips = []
    for _ in range(4):
        f0 = 220 * 2 ** rng.uniform(-0.5, 0.5)
        sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6))
                  / (k + 1) for k in range(4))
        clips.append((sig + 0.1 * rng.normal(size=t.shape)).astype(np.float32))
    sp = prim.stft_power(jnp.asarray(np.stack(clips)), 2048, 512)
    want = np.asarray(jax.vmap(
        lambda s: C.estimate_tuning_from_power(s, 22050, 2048))(sp))
    got = np.asarray(estimate_tuning_pallas(sp, 22050, 2048))
    np.testing.assert_array_equal(got, want)


def test_fused_tuning_kernel_unpackable_band_fallback():
    """Bands too tall for the 8-bit packed vote (> 509 rows, e.g. n_fft
    8192) must take the flat-histogram fallback and still bit-match the
    staged path."""
    import jax
    import jax.numpy as jnp

    import tpuvae.dsp.chroma as C
    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.tuning import _tuning_consts, estimate_tuning_pallas

    n_fft = 8192
    _, r8, *_ = _tuning_consts(22050, n_fft, n_fft // 2 + 1, 0.01)
    assert (r8 + 1) // 2 > 255  # really exercises the unpacked branch

    rng = np.random.default_rng(17)
    t = np.arange(2 * 22050) / 22050.0
    clips = []
    for _ in range(2):
        f0 = 220 * 2 ** rng.uniform(-0.5, 0.5)
        sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1)
                  for k in range(3))
        clips.append((sig + 0.05 * rng.normal(size=t.shape)).astype(np.float32))
    sp = prim.stft_power(jnp.asarray(np.stack(clips)), n_fft, 2048)
    want = np.asarray(jax.vmap(
        lambda s: C.estimate_tuning_from_power(s, 22050, n_fft))(sp))
    got = np.asarray(estimate_tuning_pallas(sp, 22050, n_fft))
    np.testing.assert_array_equal(got, want)


def test_fused_tuning_kernel_padded_input_matches_sliced():
    """The tuning kernel fed the CT kernel's padded bin-order power (with
    colmax + n_frames masking of the real-power pad columns) must agree
    exactly with the sliced-input evaluation."""
    import jax.numpy as jnp

    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.stft import stft_fused_features_ct_pallas
    from tpuvae.ops.tuning import estimate_tuning_pallas

    rng = np.random.default_rng(5)
    t = np.arange(2 * 22050) / 22050.0
    clips = []
    for _ in range(3):
        f0 = 220 * 2 ** rng.uniform(-0.5, 0.5)
        sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1)
                  for k in range(3))
        clips.append((sig + 0.05 * rng.normal(size=t.shape)).astype(np.float32))
    y = jnp.asarray(np.stack(clips))
    fe = stft_fused_features_ct_pallas(y, 2048, 512, sr=22050, n_mels=16)
    assert fe.power_padded.shape[-1] > fe.n_frames  # pad columns exist
    assert fe.power.dtype == jnp.bfloat16  # fast mode stores bf16
    # same colmax both ways: the fused kernel's f32 colmax is the piptrack
    # reference in production, while a bf16-recomputed max would differ
    want = np.asarray(
        estimate_tuning_pallas(fe.power, 22050, 2048, colmax=fe.colmax)
    )
    got = np.asarray(
        estimate_tuning_pallas(
            fe.power_padded, 22050, 2048, colmax=fe.colmax_padded,
            n_frames=fe.n_frames,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_fused_kernel_pre_rowed_input_matches_flat():
    """The pre-rowed (B, n_rows, hop) input path (host-side
    ``waveform_to_hop_rows_np``) must produce bit-identical outputs to the
    flat (B, num_samples) path, including the in-kernel edge-masked zcr."""
    import jax.numpy as jnp

    from tpuvae.ops.stft import (
        ct_hop_rows_geometry,
        stft_fused_features_ct_pallas,
        waveform_to_hop_rows_np,
    )

    rng = np.random.default_rng(17)
    nsamp = 3 * 22050 + 101          # deliberately not a hop multiple
    y = rng.standard_normal((2, nsamp)).astype(np.float32) * 0.2
    fe = stft_fused_features_ct_pallas(jnp.asarray(y), 2048, 512,
                                       sr=22050, n_mels=16)
    rows = np.stack(
        [waveform_to_hop_rows_np(c, 2048, 512) for c in y]
    )
    assert rows.shape[1:] == ct_hop_rows_geometry(2048, 512, nsamp)
    fe2 = stft_fused_features_ct_pallas(jnp.asarray(rows), 2048, 512,
                                        sr=22050, n_mels=16,
                                        num_samples=nsamp)
    for name in ("power_padded", "mel_power", "centroid", "bandwidth",
                 "rolloff", "zcr", "rms", "colmax"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fe, name)), np.asarray(getattr(fe2, name)),
            err_msg=name,
        )


def test_fused_kernel_zcr_is_edge_exact():
    """The in-kernel zcr (valid-pair positional mask) must equal the staged
    edge-padded ``zero_crossing_rate`` exactly — no caller patch."""
    import jax.numpy as jnp

    from tpuvae.dsp import features as feat
    from tpuvae.ops.stft import stft_fused_features_ct_pallas

    rng = np.random.default_rng(23)
    y = rng.standard_normal((2, 2 * 22050 + 7)).astype(np.float32)
    y[0, :5] = -0.3          # negative edge: zero-pad would add a crossing
    y[1, -5:] = -0.3
    fe = stft_fused_features_ct_pallas(jnp.asarray(y), 2048, 512,
                                       sr=22050, n_mels=16)
    np.testing.assert_array_equal(
        np.asarray(fe.zcr),
        np.asarray(feat.zero_crossing_rate(jnp.asarray(y), 2048, 512)),
    )


def test_ct_pallas_alternate_geometry_1024():
    """n_fft=1024 (n1r=8) exercises the radix-2 chunk FFT at a different
    power-of-two size than the reference geometry's 16, plus the fused
    front end's geometry plumbing."""
    import jax.numpy as jnp

    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.stft import stft_fused_features_ct_pallas, stft_power_ct_pallas

    rng = np.random.default_rng(31)
    y = rng.standard_normal((2, 22050)).astype(np.float32) * 0.3
    a = np.asarray(prim.stft_power(jnp.asarray(y), 1024, 256, method="fft"))
    b = np.asarray(stft_power_ct_pallas(jnp.asarray(y), 1024, 256,
                                        exact=True))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    fe = stft_fused_features_ct_pallas(jnp.asarray(y), 1024, 256,
                                       sr=22050, n_mels=24, exact=True)
    np.testing.assert_allclose(np.asarray(fe.power), a, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(fe.zcr),
        np.asarray(__import__("tpuvae.dsp.features",
                              fromlist=["zero_crossing_rate"]
                              ).zero_crossing_rate(jnp.asarray(y), 1024, 256)),
    )


def test_fused_tuning_kernel_median_radix_variants(monkeypatch):
    """The median digit-descent must be bit-exact at every radix width.

    ``TPUVAE_MEDIAN_BITS`` trades sequential rounds for parallel
    compare+reduce passes (32x1-bit bisection vs e.g. 8x4-bit radix-16
    descent); all widths select the identical order-statistic keys, so the
    tuning output must be bitwise identical to the staged XLA path.
    """
    import jax
    import jax.numpy as jnp

    import tpuvae.dsp.chroma as C
    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.tuning import estimate_tuning_pallas

    rng = np.random.default_rng(23)
    # short clips: the digit-descent logic is per-(R,T) element, so frame
    # count doesn't change what the assertion covers — only wall-clock
    t = np.arange(11025) / 22050.0
    clips = []
    for _ in range(2):
        f0 = 196 * 2 ** rng.uniform(-0.5, 0.5)
        sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6))
                  / (k + 1) for k in range(5))
        clips.append((sig + 0.05 * rng.normal(size=t.shape)).astype(np.float32))
    sp = prim.stft_power(jnp.asarray(np.stack(clips)), 2048, 512)
    want = np.asarray(jax.vmap(
        lambda s: C.estimate_tuning_from_power(s, 22050, 2048))(sp))
    # extreme widths both vote modes + the production default pair
    # (bits=2 chunked); every variant must be bit-identical
    for bits, chunked in ((1, "0"), (8, "0"), (2, "1"), (4, "1")):
        monkeypatch.setenv("TPUVAE_MEDIAN_BITS", str(bits))
        monkeypatch.setenv("TPUVAE_VOTE_CHUNKED", chunked)
        got = np.asarray(estimate_tuning_pallas(sp, 22050, 2048))
        np.testing.assert_array_equal(
            got, want, err_msg=f"bits={bits} chunked={chunked}")


def test_tuning_band_alignment_at_nyquist_fmax():
    """sr=8000 puts piptrack's fmax at Nyquist: the 8-aligned band overruns
    the 1025 real rows.  The padded power path must keep its 8-row-aligned
    DMA (overrun rows are masked), and an unpadded input must clamp onto
    the sliced path — both bit-matching the staged reference."""
    import jax
    import jax.numpy as jnp

    import tpuvae.dsp.chroma as C
    import tpuvae.dsp.primitives as prim
    from tpuvae.ops.tuning import _tuning_consts, estimate_tuning_pallas

    sr, n_fft = 8000, 2048
    lo8, r8, *_ = _tuning_consts(sr, n_fft, n_fft // 2 + 1, 0.01)
    assert r8 % 8 == 0, "band must stay 8-row-aligned for the DMA kernel"
    assert lo8 + r8 > n_fft // 2 + 1, "test must exercise the overrun case"

    rng = np.random.default_rng(5)
    t = np.arange(2 * sr) / sr
    clips = []
    for _ in range(2):
        f0 = 220 * 2 ** rng.uniform(-0.4, 0.4)
        sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6))
                  / (k + 1) for k in range(4))
        clips.append((sig + 0.05 * rng.normal(size=t.shape)).astype(np.float32))
    sp = prim.stft_power(jnp.asarray(np.stack(clips)), n_fft, 512)
    want = np.asarray(jax.vmap(
        lambda s: C.estimate_tuning_from_power(s, sr, n_fft))(sp))

    # unpadded (B, 1025, T) input -> clamped sliced path
    got_sliced = np.asarray(estimate_tuning_pallas(sp, sr, n_fft))
    np.testing.assert_array_equal(got_sliced, want)

    # padded input with extra rows (as the CT kernel emits) -> DMA path;
    # fill the pad rows with huge garbage to prove they cannot leak in
    padded = np.pad(np.asarray(sp), ((0, 0), (0, 127), (0, 0)),
                    constant_values=1e30)
    nf = sp.shape[2]
    got_padded = np.asarray(estimate_tuning_pallas(
        jnp.asarray(padded), sr, n_fft,
        colmax=jnp.max(sp, axis=1), n_frames=nf,
    ))
    np.testing.assert_array_equal(got_padded, want)


def test_autotune_candidates_legal_and_budgeted():
    from tpuvae.ops import autotune as at

    for n, m, dp in [(1336, 1336, 128), (10240, 10240, 128),
                     (50, 50, 128), (4096, 4096, 512)]:
        cands = at.pairwise_tile_candidates(n, m, dp)
        assert cands, (n, m, dp)
        for tn, tm in cands:
            assert tn % 8 == 0 and tm % 128 == 0
            assert at.pairwise_tile_bytes(tn, tm, dp) <= at.VMEM_BUDGET_BYTES
        # analytic pick is the roofline-cheapest candidate within the
        # measured tile ceilings (MAX_MEASURED_TILE 2026-08-19;
        # MAX_MEASURED_TILE_N, round-5 A/B 2026-08-21)
        tn, tm = at.pairwise_tiles_analytic(n, m, dp)
        assert (tn, tm) in cands
        assert max(tn, tm) <= at.MAX_MEASURED_TILE
        assert tn <= at.MAX_MEASURED_TILE_N
        pool = [t for t in cands if max(t) <= at.MAX_MEASURED_TILE
                and t[0] <= at.MAX_MEASURED_TILE_N] or cands
        best = min(at.pairwise_tile_cost(n, m, dp, a, b) for a, b in pool)
        assert at.pairwise_tile_cost(n, m, dp, tn, tm) == best


def test_pairwise_tile_cost_penalizes_padding():
    """At N=1336 a 1024-tile pads the matmul to 2048x2048 — the model must
    prefer a tile with less dead work; at N=10240 the pick is the measured
    256x512 winner (round-5 v5e tile A/B: 14% over 512x512, 29% over the
    uncapped roofline favorite 1024x1024)."""
    from tpuvae.ops import autotune as at

    c_small = at.pairwise_tile_cost(1336, 1336, 128, 256, 256)
    c_big = at.pairwise_tile_cost(1336, 1336, 128, 1024, 1024)
    assert c_small < c_big
    tn, tm = at.pairwise_tiles_analytic(1336, 1336, 128)
    assert max(tn, tm) <= 512
    assert at.pairwise_tiles_analytic(10240, 10240, 128) == (256, 512)


def test_autotune_measures_once_and_persists(tmp_path, monkeypatch):
    from tpuvae.ops import autotune as at

    monkeypatch.setenv("TPUVAE_AUTOTUNE_CACHE", str(tmp_path / "tune.json"))
    at._memo.clear()
    calls = []

    def run(cfg):
        calls.append(tuple(cfg))
        return np.zeros(())

    durations = {(8, 128): 5.0, (8, 256): 1.0, (16, 128): 3.0}

    def timed_run(run, cfg, timer):
        return durations[tuple(cfg)]

    monkeypatch.setattr(at, "_timed_run", timed_run)
    got = at.autotune("fake", (100, 200), list(durations), run, repeats=2)
    assert got == (8, 256)
    assert len(calls) == len(durations)          # one warmup per candidate

    # a fresh process (memo cleared) must hit the JSON cache, not re-measure
    at._memo.clear()
    calls.clear()
    got2 = at.autotune("fake", (100, 200), list(durations), run, repeats=2)
    assert got2 == (8, 256) and calls == []

    # same bucket (power-of-two rounding) shares the selection
    got3 = at.autotune("fake", (70, 140), list(durations), run, repeats=2)
    assert got3 == (8, 256) and calls == []
    at._memo.clear()


def test_pairwise_auto_tiles_match_explicit():
    """Default (auto-selected) tiles give the same distances as explicit."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(90, 33)).astype(np.float32)
    got = np.asarray(squared_distances_pallas(x, x))
    want = np.asarray(squared_distances(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_tuning_vmem_byte_model_reference_geometry():
    """The scoped-VMEM model must reproduce the measured v5e fit/no-fit
    boundary at the production band (VERDICT r3 #1: exact-mode f32 power +
    chunked vote needed 17.12 MB > 16 MB and Mosaic-compile-crashed; every
    other combination ran)."""
    from tpuvae.ops.tuning import (
        _tuning_consts,
        tuning_kernel_bytes,
        tuning_pallas_fits,
    )
    from tpuvae.ops.vmem import VMEM_SCOPED_BYTES_DEFAULT as BUDGET

    _, r8, *_ = _tuning_consts(22050, 2048, 1025, 0.01)
    t = 1408  # lane-padded production frame axis (1292 → next 128-multiple)
    # exact mode (f32): chunked rejected, unchunked fits
    assert tuning_kernel_bytes(r8, t, 4, True) > BUDGET
    assert tuning_kernel_bytes(r8, t, 4, False) <= BUDGET
    # fast mode (bf16): both fit (the measured round-3 default)
    assert tuning_kernel_bytes(r8, t, 2, True) <= BUDGET
    assert tuning_kernel_bytes(r8, t, 2, False) <= BUDGET
    # the batch-API gate says the fused kernel is usable in BOTH modes
    assert tuning_pallas_fits(1152, t, 4, 22050, 2048)
    assert tuning_pallas_fits(1152, t, 2, 22050, 2048)


def test_tuning_vmem_guard_2x_geometry_degrades():
    """At ~2x the frame axis (60 s clips) even the smallest fused-kernel
    footprint blows the arena — the gate must say so, routing
    estimate_tuning_batch to the staged XLA path instead of a Mosaic
    compile error."""
    from tpuvae.ops.tuning import tuning_pallas_fits

    assert not tuning_pallas_fits(1152, 2816, 4, 22050, 2048)
    assert not tuning_pallas_fits(1152, 2816, 2, 22050, 2048)


def test_stft_vmem_byte_models_measured_boundary():
    """Models must reproduce the measured v5e compile boundary
    (2026-08-20): both Pallas STFT paths compile at n_fft<=4096 and
    Mosaic-compile-error at 8192 (stft_power_pallas's error reports
    21.19 MB vs the 16 MB arena — the model's exact prediction)."""
    from tpuvae.ops.stft import (
        ct_pallas_supports,
        stft_ct_pallas_bytes,
        stft_pallas_bytes,
    )
    from tpuvae.ops.vmem import VMEM_SCOPED_BYTES_DEFAULT as BUDGET

    # reference geometry and one step up: fits
    for n_fft, hop in ((2048, 512), (4096, 1024)):
        assert stft_pallas_bytes(n_fft, hop) <= BUDGET
        assert stft_ct_pallas_bytes(n_fft, hop, True) <= BUDGET
        assert stft_ct_pallas_bytes(n_fft, hop, False) <= BUDGET
        assert ct_pallas_supports(n_fft, hop)
    # 4x reference: measured Mosaic compile error on both paths
    assert stft_pallas_bytes(8192, 2048) > BUDGET
    # the model must match Mosaic's own 21.19 MB figure closely
    assert abs(stft_pallas_bytes(8192, 2048) - 21.19 * 2**20) < 0.3 * 2**20
    assert stft_ct_pallas_bytes(8192, 2048, False) > BUDGET
    assert not ct_pallas_supports(8192, 2048)


def test_select_vmem_model_and_xla_fallback():
    """Measured v5e boundary (2026-08-20): 5.1 MB keys (reference tuning
    geometry) compile, 10.1 MB (2x) don't.  Over-budget inputs must route
    to the vmapped XLA binary search and still give exact medians."""
    import numpy as np

    from tpuvae.ops.select import masked_median_batch, select_kernel_bytes
    from tpuvae.ops.vmem import VMEM_SCOPED_BYTES_DEFAULT as BUDGET

    n_ref = 1025 * 1292
    assert select_kernel_bytes(n_ref + (-n_ref) % 128) <= BUDGET
    assert select_kernel_bytes(2 * n_ref) > BUDGET

    # functional check of the fallback: force a tiny budget so even a
    # small input takes the XLA path (interpret=False exercises the gate)
    rng = np.random.default_rng(5)
    vals = rng.standard_normal((3, 4096)).astype(np.float32)
    mask = rng.random((3, 4096)) > 0.4
    import os

    os.environ["TPUVAE_VMEM_SCOPED_BYTES"] = "1024"
    try:
        out = np.asarray(masked_median_batch(
            jnp.asarray(vals), jnp.asarray(mask), interpret=False))
    finally:
        del os.environ["TPUVAE_VMEM_SCOPED_BYTES"]
    ref = np.array([np.median(v[m]) for v, m in zip(vals, mask)])
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)

"""Model-family tests: shapes, parameter-count parity, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.models import (
    ConditionalVAE,
    HybridVAE,
    SimpleAutoencoder,
    SimpleVAE,
    cvae_loss,
    hybrid_loss,
    simple_vae_loss,
)
from tpuvae.train import create_state, param_count


def test_simple_vae_shapes_and_params():
    model = SimpleVAE(input_dim=370)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((8, 370))
    state = create_state(model, rng, (x, rng), 1e-4, train=True)
    recon, mu, logvar, z = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, rng, train=False,
    )
    assert recon.shape == (8, 370)
    assert mu.shape == logvar.shape == z.shape == (8, 32)
    # torch model: ~120K params (SURVEY.md C11). Exact torch count=121,162
    # incl. BN affine; flax matches the Linear+BN structure.
    n = param_count(state.params)
    assert 100_000 < n < 140_000, n


def test_simple_vae_loss_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) mean-form; zero at standard normal
    mu = jnp.zeros((4, 32))
    logvar = jnp.zeros((4, 32))
    x = jnp.ones((4, 370))
    total, rec, kl = simple_vae_loss(x, x, mu, logvar, beta=0.8)
    assert float(kl) == 0.0 and float(rec) == 0.0 and float(total) == 0.0
    mu = jnp.full((1, 2), 2.0)
    logvar = jnp.log(jnp.full((1, 2), 4.0))
    _, _, kl = simple_vae_loss(x[:1], x[:1], mu, logvar, beta=1.0)
    want = -0.5 * np.mean(1 + np.log(4.0) - 4.0 - 4.0)
    np.testing.assert_allclose(float(kl), want, rtol=1e-6)


def _small_image(b):
    return jnp.zeros((b, 128, 1024, 1), jnp.float32)


def test_conditional_vae_shapes_and_params():
    model = ConditionalVAE(latent_dim=64, num_classes=9)
    rng = jax.random.PRNGKey(0)
    audio, text, cond = _small_image(2), jnp.ones((2, 768)), jnp.ones((2, 9))
    state = create_state(model, rng, (audio, text, cond, rng), 1e-4, train=True)
    ra, rt, mu, logvar = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        audio, text, cond, rng, train=False,
    )
    assert ra.shape == audio.shape and rt.shape == text.shape
    assert mu.shape == (2, 64)
    n = param_count(state.params)
    # reference ≈12M (SURVEY.md C14)
    assert 10e6 < n < 14e6, n


def test_hybrid_vae_shapes_and_params():
    model = HybridVAE(latent_dim=128)
    rng = jax.random.PRNGKey(0)
    audio, text = _small_image(2), jnp.ones((2, 768))
    state = create_state(model, rng, (audio, text, rng), 1e-4, train=True)
    ra, rt, mu, logvar = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        audio, text, rng, train=False,
    )
    assert ra.shape == audio.shape and rt.shape == text.shape
    assert mu.shape == (2, 128)
    n = param_count(state.params)
    # reference ≈43M, dominated by the two 16384×1024 Linears (SURVEY.md C18)
    assert 38e6 < n < 48e6, n


def test_sum_losses_scale_with_batch():
    """cvae/hybrid losses are sum-reductions (ref quirk, SURVEY.md §7)."""
    a1, t1 = jnp.ones((1, 4, 4, 1)), jnp.ones((1, 8))
    a2, t2 = jnp.ones((2, 4, 4, 1)), jnp.ones((2, 8))
    mu1, lv1 = jnp.ones((1, 3)), jnp.zeros((1, 3))
    mu2, lv2 = jnp.ones((2, 3)), jnp.zeros((2, 3))
    l1 = cvae_loss(a1 * 0, a1, t1 * 0, t1, mu1, lv1)[0]
    l2 = cvae_loss(a2 * 0, a2, t2 * 0, t2, mu2, lv2)[0]
    np.testing.assert_allclose(float(l2), 2 * float(l1), rtol=1e-6)
    h1 = hybrid_loss(a1 * 0, a1, t1 * 0, t1, mu1, lv1)[0]
    h2 = hybrid_loss(a2 * 0, a2, t2 * 0, t2, mu2, lv2)[0]
    np.testing.assert_allclose(float(h2), 2 * float(h1), rtol=1e-6)
    # text weights differ: 200 (cvae) vs 350 (hybrid)
    tl_c = cvae_loss(a1, a1, t1 * 0, t1, mu1 * 0, lv1)[0]
    tl_h = hybrid_loss(a1, a1, t1 * 0, t1, mu1 * 0, lv1)[0]
    np.testing.assert_allclose(float(tl_h) / float(tl_c), 350.0 / 200.0, rtol=1e-6)


def test_autoencoder_roundtrip_shapes():
    model = SimpleAutoencoder(input_dim=290, latent_dim=64)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 290))
    params = model.init(rng, x)["params"]
    recon, z = model.apply({"params": params}, x)
    assert recon.shape == (4, 290) and z.shape == (4, 64)


def test_conv_impl_lowerings_match_direct():
    """Every conv lowering policy (s2d / d2s_dec / mixed) computes the same
    trunk function as 'direct' — same param tree, fp-level-equal outputs
    and parameter gradients (tpuvae/models/layers.py)."""
    from tpuvae.models.layers import ConvDecoderTrunk, ConvEncoderTrunk

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)) * 0.1, jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 512)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(module_cls, inp, impl, **kw):
        mod = module_cls(impl=impl, **kw)
        variables = mod.init(key, inp, train=False)

        def f(params):
            out = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                inp, train=False)
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(f)(variables["params"])
        return variables["params"], val, grads

    for module_cls, inp, kw in (
        (ConvEncoderTrunk, x, {}),
        (ConvDecoderTrunk, h, {"feature_hw": (1, 1)}),
    ):
        p0, v0, g0 = run(module_cls, inp, "direct", **kw)
        for impl in ("s2d", "d2s_dec", "mixed"):
            p1, v1, g1 = run(module_cls, inp, impl, **kw)
            assert jax.tree_util.tree_structure(p0) == \
                jax.tree_util.tree_structure(p1)
            for a, b in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(p1)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_allclose(float(v0), float(v1), rtol=1e-4,
                                       err_msg=f"{module_cls.__name__} {impl}")
            for a, b in zip(jax.tree_util.tree_leaves(g0),
                            jax.tree_util.tree_leaves(g1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4,
                    err_msg=f"{module_cls.__name__} {impl}")

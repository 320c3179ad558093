"""Loss adapters binding each model family to the generic fit() loop.

Each returns ``loss_fn(state, variables, batch, rng, train)`` →
``(loss, aux, new_model_state)`` as consumed by ``tpuvae.train.loop.fit``.
"""

from __future__ import annotations

import jax

from tpuvae.models import ae_loss, cvae_loss, hybrid_loss, simple_vae_loss


def _apply(state, variables, rng, train, *args):
    rng_drop, rng_z = jax.random.split(rng)
    if train:
        out, mutated = state.apply_fn(
            variables, *args, rng_z, train=True,
            rngs={"dropout": rng_drop}, mutable=["batch_stats"],
        )
        return out, mutated
    out = state.apply_fn(variables, *args, rng_z, train=False)
    return out, {}


def simple_vae_objective(beta: float = 0.8):
    def loss_fn(state, variables, batch, rng, train):
        (x,) = batch
        (recon, mu, logvar, _), mutated = _apply(state, variables, rng, train, x)
        loss, rec, kl = simple_vae_loss(recon, x, mu, logvar, beta)
        return loss, {"recon": rec, "kl": kl}, mutated

    return loss_fn


def cvae_objective(beta: float = 4.0, text_weight: float = 200.0):
    def loss_fn(state, variables, batch, rng, train):
        audio, text, cond = batch
        (ra, rt, mu, logvar), mutated = _apply(
            state, variables, rng, train, audio, text, cond
        )
        loss, ma, mt, kl = cvae_loss(ra, audio, rt, text, mu, logvar, beta, text_weight)
        return loss, {"mse_audio": ma, "mse_text": mt, "kl": kl}, mutated

    return loss_fn


def hybrid_objective(beta: float = 1.0, text_weight: float = 350.0):
    def loss_fn(state, variables, batch, rng, train):
        audio, text = batch
        (ra, rt, mu, logvar), mutated = _apply(
            state, variables, rng, train, audio, text
        )
        loss, ma, mt, kl = hybrid_loss(
            ra, audio, rt, text, mu, logvar, beta=beta, text_weight=text_weight
        )
        return loss, {"mse_audio": ma, "mse_text": mt, "kl": kl}, mutated

    return loss_fn


def autoencoder_objective():
    def loss_fn(state, variables, batch, rng, train):
        (x,) = batch
        recon, _ = state.apply_fn(variables, x)
        loss = ae_loss(recon, x)
        return loss, {}, {}

    return loss_fn

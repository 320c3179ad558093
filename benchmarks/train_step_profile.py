"""Profile the Hybrid VAE train step on TPU: timing + device-op breakdown.

Usage:
    python benchmarks/train_step_profile.py [--dtype bfloat16] [--trace]

Measures per-step time at the reference geometry (bs 32, mel (128,1024),
text 768; ref ``Convolutional_VAE.py:199-271``) with pipelined dispatches
(one host sync at the end — ``block_until_ready`` is a no-op through the
axon relay, see docs/PERFORMANCE.md).  With ``--trace``, wraps one step in
``jax.profiler.trace`` and aggregates device events by op name.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def aggregate_trace(trace_dir: str, top: int = 25) -> None:
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files found", file=sys.stderr)
        return
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname and "/device" not in pname.lower():
                continue
            name = ev.get("name", "?")
            totals[name] += ev.get("dur", 0.0)
            counts[name] += 1
    total_us = sum(totals.values())
    print(f"\ndevice events total: {total_us / 1e3:.2f} ms across "
          f"{len(totals)} distinct ops")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us / 1e3:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


def build_train_setup(model_name: str, dtype_name: str, batch: int = 32):
    """Jitted train step + state + pipelined input batches at the reference
    geometry for one of the three model families.  Returns
    ``(train_step, state, batches, key)`` — shared by this profiler and by
    ``bench.py``'s multi-metric record."""
    import jax
    import jax.numpy as jnp

    from tpuvae.models import ConditionalVAE, HybridVAE, SimpleVAE
    from tpuvae.train import create_state
    from tpuvae.train.objectives import (
        cvae_objective, hybrid_objective, simple_vae_objective,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dtype = jnp.dtype(dtype_name)
    B = batch
    if model_name == "hybrid":
        model = HybridVAE(dtype=dtype)
        mel = rng.standard_normal((B, 128, 1024, 1), np.float32)
        text = rng.standard_normal((B, 768), np.float32)
        batches = [(jnp.asarray(np.roll(mel, i, 0)), jnp.asarray(text))
                   for i in range(3)]
        example = (batches[0][0][:1], batches[0][1][:1], key)
        objective = hybrid_objective()
    elif model_name == "cvae":
        model = ConditionalVAE(num_classes=8, dtype=dtype)
        mel = rng.standard_normal((B, 128, 1024, 1), np.float32)
        text = rng.standard_normal((B, 768), np.float32)
        cond = np.eye(8, dtype=np.float32)[rng.integers(0, 8, B)]
        batches = [(jnp.asarray(np.roll(mel, i, 0)), jnp.asarray(text),
                    jnp.asarray(cond)) for i in range(3)]
        example = (batches[0][0][:1], batches[0][1][:1],
                   batches[0][2][:1], key)
        objective = cvae_objective()
    else:
        model = SimpleVAE(dtype=dtype)
        x = rng.standard_normal((B, 370), np.float32)
        batches = [(jnp.asarray(np.roll(x, i, 0)),) for i in range(3)]
        example = (batches[0][0][:1], key)
        objective = simple_vae_objective()

    state = create_state(model, key, example, 1e-4, train=True)
    loss_fn = objective

    @jax.jit
    def train_step(state, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux, new_model_state = loss_fn(
                state, variables, batch, rng, True)
            return loss, (aux, new_model_state)

        (loss, (aux, ms)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(
            batch_stats=ms.get("batch_stats", state.batch_stats))
        return state, loss

    return train_step, state, batches, key


def measure_steps(train_step, state, batches, key, reps: int = 10,
                  rounds: int = 3) -> float:
    """Best-of-``rounds`` pipelined per-step seconds (one sync per round)."""
    import jax

    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        st = state
        for i in range(reps):
            st, loss = train_step(st, batches[i % len(batches)],
                                  jax.random.fold_in(key, i))
        np.asarray(loss)
        best = min(best, (time.time() - t0) / reps)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--model", default="hybrid", choices=["hybrid", "cvae",
                                                          "simple"])
    args = ap.parse_args()

    import jax

    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    train_step, state, batches, key = build_train_setup(
        args.model, args.dtype, args.batch)

    t0 = time.time()
    state, loss = train_step(state, batches[0], key)
    np.asarray(loss)
    print(f"compile+first step: {time.time() - t0:.1f}s  loss={loss}",
          file=sys.stderr)

    best = measure_steps(train_step, state, batches, key, reps=args.reps)
    print(f"{args.model} train step ({args.dtype}, bs {args.batch}): "
          f"{best * 1e3:.2f} ms/step = {args.batch / best:.0f} clips/s")

    if args.trace:
        import shutil
        import tempfile

        trace_dir = tempfile.mkdtemp(prefix="tpuvae_prof_")
        with jax.profiler.trace(trace_dir):
            st = state
            for i in range(3):
                st, loss = train_step(st, batches[i],
                                      jax.random.fold_in(key, 100 + i))
            np.asarray(loss)
        aggregate_trace(trace_dir)
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tpuvae.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

def probe(name, kernel, in_shape, out_shape):
    try:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape), jnp.float32)
        out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {msg}", flush=True)

# (a) stride-2 slice on the sublane (second-to-last) dim
probe("sublane_stride2",
      lambda x_ref, o_ref: o_ref.__setitem__(..., lax.slice(x_ref[...], (0,0), (128,512), (2,1))),
      (128, 512), (64, 512))
# (a2) stride-2 slice on an untiled (major) dim
probe("untiled_stride2",
      lambda x_ref, o_ref: o_ref.__setitem__(..., lax.slice(x_ref[...], (0,0,0), (64,512,32), (2,1,1))),
      (64, 512, 32), (32, 512, 32))
# (b) lane shift by 1 (concat on last dim)
probe("lane_shift1",
      lambda x_ref, o_ref: o_ref.__setitem__(..., jnp.concatenate(
          [x_ref[...][:, 1:], jnp.zeros((128,1), jnp.float32)], axis=1)),
      (128, 512), (128, 512))
# (d) dot_general with untiled batch dim: (32,256,32) x (32,64) contracting lanes
def dg_kernel(x_ref, o_ref):
    w = jnp.ones((32, 64), jnp.float32)
    o_ref[...] = lax.dot_general(x_ref[...], w, (((2,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST)
probe("batched_dot_untiled", dg_kernel, (32, 256, 32), (32, 256, 64))
# (c) broadcast-insert minor singleton: (128,512) -> (128,512,32)
def bc_kernel(x_ref, o_ref):
    w = jnp.ones((32,), jnp.float32)
    o_ref[...] = x_ref[...][:, :, None] * w[None, None, :]
probe("broadcast_insert_minor", bc_kernel, (128, 512), (128, 512, 32))
print("PROBE DONE", flush=True)

"""Hardware parity check for the slab G/S paths (interpret mode zero-fills
scratch, so the dead-wedge-garbage hazard only shows on a real chip), then
quick marginal A/Bs.  Run on TPU."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ppca_rs_tpu.config import config
from ppca_rs_tpu.ops import masked_linalg as ml

assert jax.default_backend() == "tpu", jax.devices()

rng = np.random.default_rng(0)
B, D, k = 1024, 256, 64
C = jnp.asarray(rng.normal(size=(D, k)), jnp.float32)
mean = jnp.asarray(rng.normal(size=D), jnp.float32)
sig = jnp.float32(0.8)
data = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
mask = jnp.asarray(rng.random((B, D)) > 0.5)
data = jnp.where(mask, data, 0.0)
w = jnp.asarray(rng.random(B) + 0.5, jnp.float32)


def stats():
    return jax.jit(lambda *a: ml.em_stats(*a, block_size=128))(
        C, mean, sig, data, mask, w
    )


ref = stats()
results = {}
for gs, ss in ((True, False), (False, True), (True, True)):
    config.g_slab_inputs, config.s_slab_stats = gs, ss
    got = stats()
    tril = np.tril(np.ones((k, k)))
    S_r = np.asarray(ref.S, np.float64).reshape(D, k, k) * tril
    S_g = np.asarray(got.S, np.float64).reshape(D, k, k) * tril
    err = dict(
        S=float(np.abs(S_g - S_r).max() / np.abs(S_r).max()),
        cross=float(np.abs(np.asarray(got.cross) - np.asarray(ref.cross)).max()
                    / np.abs(np.asarray(ref.cross)).max()),
        llk=abs(float(got.llk) - float(ref.llk)) / abs(float(ref.llk)),
        finite=bool(all(np.isfinite(np.asarray(x)).all() for x in got)),
    )
    print(f"g_slab={gs} s_slab={ss}: {err}", flush=True)
    assert err["finite"] and err["S"] < 1e-5 and err["llk"] < 1e-5, err
config.g_slab_inputs = config.s_slab_stats = False
print("HW PARITY OK", flush=True)

"""Pallas TPU kernels for the masked-PPCA E-step.

Why this exists: the E-step's per-sample k x k SPD factorization+solves are
the one part of the EM that XLA:TPU runs badly — batched `cholesky` /
`triangular_solve` on (8192, 64, 64) operands execute at a few GFLOP/s
(measured ~70 ms per 8k-sample block on v5e, vs ~3 ms for ALL the big MXU
matmuls of the same block combined).  The fix is a single fused kernel that
lays the batch out on the *lane* dimension — shape (k, k, B) with B on the
128-wide lanes — so every scalar step of the factorization is an elementwise
VPU op over 128 samples at once:

    A = sigma^2 I + G            # per-sample masked Gram (input, from MXU)
    L = chol(A)                  # right-looking, outer-product updates
    logdet = sum log diag        # matrix-determinant-lemma piece
    W = L^{-1}                   # right-looking forward solve vs I
    M^{-1} = W^T W               # accumulated outer products
    s = M^{-1} b                 # posterior state
    SM = s s^T + sigma^2 M^{-1}  # E[xx^T] second moment (M-step input)
    sq = sigma^2 <G, M^{-1}>     # tr(G Sigma), via <G,M^{-1}> = k - s2 tr(M^{-1})
    llk                          # full per-sample log-likelihood

All loops are `fori_loop`s over the k columns; each iteration touches
(k, k, 128) tiles with leading-axis dynamic indexing only (cheap on TPU —
no cross-lane shuffles, no sublane-dynamic writes).

VMEM budget: the G input streams by one manual DMA straight into the working
copy A (no pipelined double-buffer for it), and the tail needs no G because
``<G, M^{-1}> = k - sigma^2 tr(M^{-1})`` (G = M - sigma^2 I, tr(M M^{-1}) = k).
The SM output stays a pipelined block so its store overlaps the next tile's
compute.  A panel-blocked (rank-8 update) variant was tried and measured
*slower* (7.9 vs 4.9 ms per 8k block): the kernel is VPU-compute bound, not
VMEM-bandwidth bound, and short serial (k, T) panel ops pipeline worse than
the big rank-1 (k, k, T) updates.

Equivalent to (and tested against) the XLA path in
`ops/masked_linalg.block_posterior` + `block_covariances` + `block_llk`,
which mirrors `ppca/src/output_covariance.rs` / `ppca_model.rs:195-208`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_2PI = 1.8378770664093453

LANE = 128
MAX_K = 72  # VMEM budget: 3 scratch + 2x pipelined SM out (k,k,128) f32 buffers


def _spd_estep_kernel(sigma_ref, G_hbm, b_ref, rn_ref, dob_ref,
                      s_ref, SM_ref, llk_ref, sq_ref,
                      A_scr, L_scr, W_scr, in_sem):
    k = A_scr.shape[0]
    T = A_scr.shape[2]
    sigma2 = sigma_ref[0, 0]
    ii = lax.broadcasted_iota(jnp.int32, (k, T), 0)   # row index over (k, T)
    i = pl.program_id(0)

    # Stream this tile's G straight into the working copy A.
    copy_in = pltpu.make_async_copy(G_hbm.at[:, :, pl.ds(i * T, T)], A_scr, in_sem)
    copy_in.start()

    eye_col = (lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
               == lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)).astype(b_ref.dtype)
    copy_in.wait()
    A_scr[...] = A_scr[...] + sigma2 * eye_col        # A = G + sigma^2 I

    # --- Cholesky, right-looking.  Column j of A after j rank-1 updates
    # holds M[:,j] - sum_{p<j} L[:,p] L[j,p]; its diagonal entry is L_jj^2.
    def chol_body(j, logdet):
        colM = A_scr[j]                                   # (k, T)
        diag = jnp.sum(jnp.where(ii == j, colM, 0.0), axis=0)   # (T,)
        lcol = colM * lax.rsqrt(diag)[None, :]
        lcol = jnp.where(ii >= j, lcol, 0.0)              # lcol[j] = sqrt(diag)
        L_scr[j] = lcol
        A_scr[...] = A_scr[...] - lcol[:, None, :] * lcol[None, :, :]
        return logdet + jnp.log(diag)

    logdet = lax.fori_loop(0, k, chol_body, jnp.zeros((T,), b_ref.dtype))

    # --- W = L^{-1} by right-looking forward solve against I.
    # Res (reusing A) rows: Res[i] = residual of equation i over rhs m.
    A_scr[...] = eye_col * jnp.ones((1, 1, T), b_ref.dtype)

    def w_body(j, _):
        lcol = L_scr[j]                                   # (k, T)
        ljj = jnp.sum(jnp.where(ii == j, lcol, 0.0), axis=0)
        wrow = A_scr[j] / ljj[None, :]                    # (k_m, T)
        W_scr[j] = wrow
        A_scr[...] = A_scr[...] - lcol[:, None, :] * wrow[None, :, :]
        return 0

    lax.fori_loop(0, k, w_body, 0)

    # --- M^{-1} = W^T W accumulated into the SM output buffer.
    SM_ref[...] = jnp.zeros_like(SM_ref)

    def minv_body(j, _):
        wrow = W_scr[j]                                   # (k, T)
        SM_ref[...] = SM_ref[...] + wrow[:, None, :] * wrow[None, :, :]
        return 0

    lax.fori_loop(0, k, minv_body, 0)

    # --- posterior state s = M^{-1} b; llk; sq via the trace identity.
    b = b_ref[...]                                        # (k, T)
    s = jnp.sum(SM_ref[...] * b[None, :, :], axis=1)      # (k, T)
    s_ref[...] = s
    tr_minv = jnp.sum(SM_ref[...] * eye_col, axis=(0, 1))
    sq_ref[...] = (sigma2 * (k - sigma2 * tr_minv))[None, :]

    bs = jnp.sum(b * s, axis=0)                           # (T,)
    rnorm = rn_ref[0, :]
    d_obs = dob_ref[0, :]
    quad = (rnorm - bs) / sigma2
    ld = logdet + jnp.log(sigma2) * (d_obs - k)
    llk_ref[...] = (-0.5 * (quad + ld + LN_2PI * d_obs))[None, :]

    # SM = s s^T + sigma^2 M^{-1}  (in place, streamed out by the pipeline)
    SM_ref[...] = s[:, None, :] * s[None, :, :] + sigma2 * SM_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_estep(sigma: jax.Array, G3: jax.Array, b_t: jax.Array,
              rnorm: jax.Array, d_obs: jax.Array, *, interpret: bool = False):
    """Fused batched SPD E-step.

    Args:
      sigma: scalar isotropic noise (not squared).
      G3: (k, k, B) per-sample masked Grams ``C^T diag(m) C`` (B on lanes).
      b_t: (k, B) per-sample ``C^T (m * (y - mu))``.
      rnorm: (1, B) squared norms of the masked centered samples.
      d_obs: (1, B) observed-entry counts.

    Returns:
      s_t (k, B) posterior states, SM3 (k, k, B) second moments
      ``s s^T + sigma^2 M^{-1}``, llk (1, B), sq (1, B) = ``tr(G Sigma)``.
    """
    k, _, B = G3.shape
    if B % LANE != 0:
        raise ValueError(f"batch {B} must be a multiple of {LANE}")
    dtype = G3.dtype
    sigma2 = (sigma * sigma).astype(dtype).reshape(1, 1)
    grid = (B // LANE,)

    def vec_spec(rows):
        return pl.BlockSpec((rows, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _spd_estep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # G streams by manual DMA
            vec_spec(k),
            vec_spec(1),
            vec_spec(1),
        ],
        out_specs=(
            vec_spec(k),
            pl.BlockSpec((k, k, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            vec_spec(1),
            vec_spec(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, B), dtype),
            jax.ShapeDtypeStruct((k, k, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, k, LANE), dtype),        # A / Res working copy
            pltpu.VMEM((k, k, LANE), dtype),        # L
            pltpu.VMEM((k, k, LANE), dtype),        # W = L^{-1}
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(sigma2, G3, b_t, rnorm, d_obs)
    return out


def supported(k: int, block: int, dtype) -> bool:
    """Whether the fused kernel handles this configuration."""
    return 1 <= k <= MAX_K and block % LANE == 0 and dtype == jnp.float32

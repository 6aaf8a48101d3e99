"""EXPERIMENTAL fully-fused EM block kernel: the whole E+M statistics pass
in ONE Pallas program, software-pipelined so the MXU matmuls *could*
overlap the VPU factorization loop.

STATUS (v5e, measured): correct but SLOWER than the split pipeline —
2.44M vs 2.78M samples/s end-to-end at D=1024, k=64, 50% missing — and
therefore off by default (config.use_fused_estep).  The skewed-stage
design below is sound, but Mosaic serializes the stages: MXU ops whose
results are only consumed on the next grid step still execute in program
order, not in the shadow of the following VPU work, while XLA's external
matmul phase already runs at MXU speed-of-light.  Kept fully tested as
the starting point should a Mosaic scheduling-hint mechanism appear.

Motivation (measured on v5e, D=1024, k=64, 50% missing, 8192-sample
blocks): the split pipeline costs ~2.07 ms of VPU column loop
(ops/kernels.py) plus ~1.15 ms of XLA-side MXU matmuls (Gram ``mask @ CC``,
posterior S-stats ``(w*mask)^T @ SM``, cross-moment, reconstruction) that
run at MXU speed-of-light but *serially* with the kernel, plus ~0.5 GB of
HBM round trips for the (k, k, B) G and SM intermediates.  Fusing
everything into one kernel removes the intermediates and lets the MXU work
for tile i execute while the (serial, VPU-bound) column loop for tile i-1
runs — TPU cores issue matrix and vector ops to independent pipelines, so
a matmul whose result is only consumed on the NEXT grid step drains in the
shadow of the current step's vector work.

Pipeline structure (grid = n_tiles + 1, one skew step):

  step i, stage 1 (i < n_tiles)  — MXU, for tile i:
      R = mask * (data - mean)                        (T, D) rows=samples
      RT, mT = identity-matmul transposes of R, mask  (D, T) lanes=samples
      b = Ct @ RT                                     (k, T)
      G = CCt @ mT                                    (k^2, T) -> A slot
      rnorm, d_obs, w, sigma^2 -> per-tile slots; R, RT, mT, mask*w saved
  step i, stage 2 (i > 0) — VPU then MXU, for tile p = i-1:
      staircase/wedge Cholesky column loop on A[p%2]  (ops/kernels.py
      algorithm, identical numerics) -> s, M^{-1}, logdet, llk, sq
      SM = s s^T + sigma^2 M^{-1} -> group slot p % NACC
      cross += (w*s) @ R[p]                           (k, D)
      recon = C @ s; devT = RT[p] - mT[p] * recon     (D, T)
      totals/total_dev/dev_sq/llk/sq accumulate
      every NACC tiles: S += concat(SM group) @ concat(mask*w group)
      (one matmul per NACC tiles keeps the (k^2, D) accumulator's VMEM
      read-modify-write traffic at 1/NACC)

All matmuls take bfloat16 operands with float32 accumulation — the same
precision class as the XLA path's "default" matmul precision that the
auto rule picks for D >= 512 (models/ppca.py:_precision), except the two
transposes, which run at HIGHEST precision so rnorm/d_obs stay f32-exact.

Outputs are pure accumulators (no per-sample arrays leave the chip):
cross (k, D), S (k^2, D), totals (D, 1), total_dev (D, 1), and per-lane
partial sums (4, 128) of [w*llk, w*tr(G Sigma), w*|dev|^2, unused].
Zero-weight all-masked padding rows contribute exactly zero to every one
of them (same invariant as the rest of the library).

Equivalent to (and tested against) ops/masked_linalg.em_stats' XLA path,
which mirrors the reference EM step `ppca/src/ppca_model.rs:277-358`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import LN_2PI, LANE, PANEL, TRI_RB_MAIN, _panels

VMEM_BUDGET = 100 * 1024 * 1024  # leave headroom under the 128 MB chip VMEM


def _nacc(n_tiles: int) -> int:
    """S-matmul group size: largest of 8/4/2/1 dividing the tile count."""
    for g in (8, 4, 2, 1):
        if n_tiles % g == 0:
            return g
    return 1


def _vmem_bytes(D: int, k: int, nacc: int) -> int:
    k2 = k * k
    T = LANE
    return 4 * (
        2 * k2 * T            # A slots
        + 2 * k2 * T          # Res + SM working
        + nacc * k2 * T       # SM group
        + nacc * T * D        # mask*w group
        + 3 * 2 * T * D       # R / RT / mT slots
        + k2 * D              # S accumulator output
        + k2 * D              # CCt input
        + k * D * 3           # C, Ct, cross
        + 8 * T * D // 128    # small slots and vectors (rough)
    )


def supported(D: int, k: int, block_size: int, dtype) -> bool:
    """Whether the fused EM kernel applies to this configuration."""
    if dtype != jnp.float32 or k < 1:
        return False
    if D % LANE != 0 or block_size % LANE != 0:
        return False
    k8 = -(-k // 8) * 8
    n_tiles = block_size // LANE
    return _vmem_bytes(D, k8, _nacc(n_tiles)) <= VMEM_BUDGET


def _make_kernel(D: int, k: int, n_tiles: int, nacc: int):
    k2 = k * k
    T = LANE
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def dot(a, b, dims):
        return lax.dot_general(
            a.astype(bf16), b.astype(bf16), (dims, ((), ())),
            preferred_element_type=f32,
        )

    def kernel(
        sig_ref, w_ref, data_ref, mask_ref, C_ref, Ct_ref, CCt_ref, mean_ref,
        cross_ref, S_ref, totals_ref, tdev_ref, scal_ref,
        A_slots, b_slots, sml_slots, R_slots, RT_slots, mT_slots,
        SM_grp, mw_grp, Res_scr, SM_scr,
    ):
        i = pl.program_id(0)
        two = jnp.asarray(2, jnp.asarray(i).dtype)

        @pl.when(i == 0)
        def _():
            cross_ref[...] = jnp.zeros_like(cross_ref)
            S_ref[...] = jnp.zeros_like(S_ref)
            totals_ref[...] = jnp.zeros_like(totals_ref)
            tdev_ref[...] = jnp.zeros_like(tdev_ref)
            scal_ref[...] = jnp.zeros_like(scal_ref)

        # Stage 2 (tile i-1) runs BEFORE stage 1 (tile i): stage 1's matmul
        # results are only consumed by the NEXT step's stage 2, so they
        # drain on the MXU in the shadow of that step's VPU column loop —
        # and running stage 2 first means it reads the full mw/SM groups
        # before stage 1 overwrites group slot (i % nacc).

        # ---------------- stage 2: column loop + stats for tile i-1 ------
        @pl.when(i > 0)
        def _():
            p = i - 1
            slot = lax.rem(p, two)
            q = lax.rem(p, jnp.asarray(nacc, jnp.asarray(p).dtype))
            sml = sml_slots[slot]                   # (4, T)
            rnorm, d_obs, w_t, sigma = sml[0], sml[1], sml[2], sml[3]
            sigma2 = sigma * sigma
            b = b_slots[slot]                       # (k, T)
            ii = lax.broadcasted_iota(jnp.int32, (k, T), 0)
            eye3 = (lax.broadcasted_iota(jnp.int32, (k, k, T), 0)
                    == lax.broadcasted_iota(jnp.int32, (k, k, T), 1)).astype(f32)
            Res_scr[...] = eye3
            SM_scr[...] = jnp.zeros_like(SM_scr)

            # --- the staircase/wedge column loop (ops/kernels.py numerics)
            def col_step(j, corrections):
                colM = A_slots[slot, j] + sigma2[None, :] * (ii == j).astype(f32)
                for lc in corrections:
                    coef = jnp.sum(jnp.where(ii == j, lc, 0.0), axis=0)
                    colM = colM - lc * coef[None, :]
                diag = jnp.sum(jnp.where(ii == j, colM, 0.0), axis=0)
                inv_sqrt = lax.rsqrt(diag)
                lcol = jnp.where(ii >= j, colM * inv_sqrt[None, :], 0.0)
                return lcol, inv_sqrt, diag

            def w_step(j, inv_sqrt, pairs):
                wrow = Res_scr[j]
                for lc, wr in pairs:
                    coef = jnp.sum(jnp.where(ii == j, lc, 0.0), axis=0)
                    wrow = wrow - wr * coef[None, :]
                return wrow * inv_sqrt[None, :]

            def a_update(j0, l0, l1):
                for r0 in range(j0, k, TRI_RB_MAIN):
                    r1 = min(r0 + TRI_RB_MAIN, k)
                    l0r, l1r = l0[r0:r1], l1[r0:r1]
                    l0c, l1c = l0[r0:], l1[r0:]
                    A_slots[slot, r0:r1, r0:] = A_slots[slot, r0:r1, r0:] - (
                        jnp.expand_dims(l0r, 1) * jnp.expand_dims(l0c, 0)
                        + jnp.expand_dims(l1r, 1) * jnp.expand_dims(l1c, 0)
                    )

            def make_body(j0, j1):
                def body(pp, carry):
                    logdet, s = carry
                    j = j0 + pp * 2
                    l0, is0, d0 = col_step(j, ())
                    w0 = w_step(j, is0, ())
                    l1, is1, d1 = col_step(j + 1, (l0,))
                    w1 = w_step(j + 1, is1, ((l0, w0),))
                    logdet = logdet + jnp.log(d0) + jnp.log(d1)
                    a_update(j0, l0, l1)
                    l0t, l1t = l0[j0:], l1[j0:]
                    w0h, w1h = w0[:j1], w1[:j1]
                    Res_scr[j0:, :j1] = Res_scr[j0:, :j1] - (
                        jnp.expand_dims(l0t, 1) * jnp.expand_dims(w0h, 0)
                        + jnp.expand_dims(l1t, 1) * jnp.expand_dims(w1h, 0)
                    )
                    s = s + w0 * jnp.sum(w0 * b, axis=0)[None, :]
                    s = s + w1 * jnp.sum(w1 * b, axis=0)[None, :]
                    SM_scr[:j1, :j1] = SM_scr[:j1, :j1] + (
                        jnp.expand_dims(w0h, 1) * jnp.expand_dims(w0h, 0)
                        + jnp.expand_dims(w1h, 1) * jnp.expand_dims(w1h, 0)
                    )
                    return (logdet, s)

                return body

            carry = (jnp.zeros((T,), f32), jnp.zeros((k, T), f32))
            for j0, j1 in _panels(k):
                carry = lax.fori_loop(0, (j1 - j0) // 2, make_body(j0, j1), carry)
            logdet, s = carry

            # --- per-sample outputs -> weighted accumulators
            bs = jnp.sum(b * s, axis=0)
            quad = (rnorm - bs) / sigma2
            ld = logdet + jnp.log(sigma2) * (d_obs - k)
            llk_b = -0.5 * (quad + ld + LN_2PI * d_obs)              # (T,)
            eye_col = (lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
                       == lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)).astype(f32)
            tr_minv = jnp.sum(SM_scr[...] * eye3, axis=(0, 1))
            sq = sigma2 * (k - sigma2 * tr_minv)                     # (T,)
            SM_scr[...] = (s[:, None, :] * s[None, :, :]
                           + sigma2[None, None, :] * SM_scr[...])
            SM_grp[q] = SM_scr[...].reshape(k2, T)

            sw = s * w_t[None, :]
            cross_ref[...] = cross_ref[...] + dot(sw, R_slots[slot], ((1,), (0,)))
            recon = dot(C_ref[...], s, ((1,), (0,)))                 # (D, T)
            devT = RT_slots[slot] - mT_slots[slot] * recon
            wrow_lane = w_t[None, :]
            totals_ref[...] = totals_ref[...] + jnp.sum(
                mT_slots[slot] * wrow_lane, axis=1, keepdims=True
            )
            tdev_ref[...] = tdev_ref[...] + jnp.sum(
                devT * wrow_lane, axis=1, keepdims=True
            )
            dev_sq_lane = w_t * jnp.sum(devT * devT, axis=0)         # (T,)
            scal_ref[...] = scal_ref[...] + jnp.stack(
                [w_t * llk_b, w_t * sq, dev_sq_lane, jnp.zeros((T,), f32)]
            )

            # --- grouped S matmul: one MXU pass per nacc tiles
            @pl.when(q == nacc - 1)
            def _():
                if nacc > 1:
                    SMbig = jnp.concatenate(
                        [SM_grp[g] for g in range(nacc)], axis=1
                    )                                                # (k2, nacc*T)
                    mwbig = mw_grp[...].reshape(nacc * T, D)
                else:
                    SMbig = SM_grp[0]
                    mwbig = mw_grp[0]
                S_ref[...] = S_ref[...] + dot(SMbig, mwbig, ((1,), (0,)))

        # ---------------- stage 1: MXU prep for tile i -------------------
        @pl.when(i < n_tiles)
        def _():
            slot = lax.rem(i, two)
            q = lax.rem(i, jnp.asarray(nacc, jnp.asarray(i).dtype))
            dat = data_ref[...]                     # (T, D)
            msk = mask_ref[...]                     # (T, D)
            w_t = w_ref[...]                        # (1, T)
            R = msk * (dat - mean_ref[...])         # (T, D), mean is (1, D)
            # exact transposes via identity matmul at HIGHEST precision
            eyeT = (
                lax.broadcasted_iota(jnp.int32, (T, T), 0)
                == lax.broadcasted_iota(jnp.int32, (T, T), 1)
            ).astype(f32)
            RT = lax.dot_general(R, eyeT, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=f32)   # (D, T)
            mT = lax.dot_general(msk, eyeT, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=f32)   # (D, T)
            R_slots[slot] = R
            RT_slots[slot] = RT
            mT_slots[slot] = mT
            mw_grp[q] = msk * w_t[0, :][:, None]    # (T, D) for the S matmul
            b_slots[slot] = dot(Ct_ref[...], RT, ((1,), (0,)))       # (k, T)
            A_slots[slot] = dot(CCt_ref[...], mT, ((1,), (0,))).reshape(k, k, T)
            rnorm = jnp.sum(RT * RT, axis=0)[None, :]                # (1, T)
            d_obs = jnp.sum(mT, axis=0)[None, :]
            sml_slots[slot] = jnp.concatenate(
                [rnorm, d_obs, w_t, sig_ref[...]], axis=0
            )                                                        # (4, T)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def em_block(C, Ct, CCt, mean_row, sigma, w, data, mask_f, *, interpret=False):
    """Fused E+M statistics for one (B, D) block.

    Args:
      C: (D, k) transform;  Ct: (k, D) its transpose;  CCt: (k*k, D)
        transposed flattened row outer products (``outer_flat(C).T``).
      mean_row: (1, D).  sigma: scalar or (1, B) per-lane noise (std dev).
      w: (B,) sample weights.  data/mask_f: (B, D) f32, data zero-filled.

    Returns (cross (k, D), S (k*k, D), totals (D,), total_dev (D,),
    llk, sq_err, dev_sq) — the EMStats ingredients, unreduced over the
    model axis (there is none: the fused path requires replicated D).
    """
    D, k_real = C.shape
    B = data.shape[0]
    f32 = jnp.float32
    # pad k to the sublane multiple exactly like spd_estep (padded dims are
    # algebraically inert: see ops/kernels.py docstring)
    k8 = -(-k_real // 8) * 8
    if k8 != k_real:
        pad = k8 - k_real
        C = jnp.pad(C, ((0, 0), (0, pad)))
        Ct = jnp.pad(Ct, ((0, pad), (0, 0)))
        CCt_sq = CCt.reshape(k_real, k_real, D)
        CCt = jnp.pad(CCt_sq, ((0, pad), (0, pad), (0, 0))).reshape(k8 * k8, D)
    k = k8
    n_tiles = B // LANE
    nacc = _nacc(n_tiles)

    sigma = jnp.asarray(sigma, f32)
    sig_lanes = jnp.broadcast_to(sigma.reshape(1, -1), (1, B))
    w2 = jnp.asarray(w, f32).reshape(1, B)

    T = LANE
    k2 = k * k
    nt = n_tiles

    def clamp(i):
        return jnp.minimum(i, nt - 1)

    in_specs = [
        pl.BlockSpec((1, T), lambda i: (0, clamp(i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, clamp(i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, D), lambda i: (clamp(i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, D), lambda i: (clamp(i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((k, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((k, D), f32),
        jax.ShapeDtypeStruct((k2, D), f32),
        jax.ShapeDtypeStruct((D, 1), f32),
        jax.ShapeDtypeStruct((D, 1), f32),
        jax.ShapeDtypeStruct((4, T), f32),
    )
    scratch = [
        pltpu.VMEM((2, k, k, T), f32),      # A slots
        pltpu.VMEM((2, k, T), f32),         # b slots
        pltpu.VMEM((2, 4, T), f32),         # rnorm/d_obs/w/sigma slots
        pltpu.VMEM((2, T, D), f32),         # R slots
        pltpu.VMEM((2, D, T), f32),         # RT slots
        pltpu.VMEM((2, D, T), f32),         # mT slots
        pltpu.VMEM((nacc, k2, T), f32),     # SM group
        pltpu.VMEM((nacc, T, D), f32),      # mask*w group
        pltpu.VMEM((k, k, T), f32),         # Res working
        pltpu.VMEM((k, k, T), f32),         # SM working
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(_vmem_bytes(D, k, nacc) * 1.25) + (8 << 20),
                128 * 1024 * 1024,
            )
        )
    cross, S, totals, tdev, scal = pl.pallas_call(
        _make_kernel(D, k, n_tiles, nacc),
        grid=(n_tiles + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(sig_lanes, w2, data, mask_f, C, Ct, CCt, mean_row)

    if k != k_real:
        cross = cross[:k_real]
        S = S.reshape(k, k, D)[:k_real, :k_real].reshape(k_real * k_real, D)
    llk = jnp.sum(scal[0])
    sq_err = jnp.sum(scal[1])
    dev_sq = jnp.sum(scal[2])
    return cross, S, totals[:, 0], tdev[:, 0], llk, sq_err, dev_sq

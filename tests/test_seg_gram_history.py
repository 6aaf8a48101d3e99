"""Parity tests for the (dead-end, history-only) segment-Gram kernel —
see ops/seg_gram.py module docstring and docs/DESIGN.md."""

import numpy as np
import jax
import jax.numpy as jnp

from ppca_rs_tpu.ops import masked_linalg as ml
from ppca_rs_tpu.ops import seg_gram as sg


def test_seg_gram_interpret_parity(rng):
    for M, k, B, P in [(1, 16, 256, 5), (3, 24, 384, 12), (2, 8, 128, 1)]:
        s_t = jnp.asarray(rng.normal(size=(M, k, B)))
        w = jnp.asarray(rng.random((M, B)))
        pidx = jnp.asarray(rng.integers(0, P, size=B), jnp.int32)
        for ranges in [tuple(ml._sm_slabs(k)), ((0, k, k),)]:
            p_pad = -(-P // 8) * 8
            out = np.asarray(sg.seg_gram(s_t, w, pidx, ranges=ranges,
                                         p_pad=p_pad, interpret=True))
            offs, q = sg._offsets(ranges)
            ref = np.zeros((M, q, p_pad))
            sn, wn, pn = np.asarray(s_t), np.asarray(w), np.asarray(pidx)
            for m in range(M):
                for (r0, r1, cw), q0 in zip(ranges, offs):
                    part = (sn[m, r0:r1][:, None, :] *
                            sn[m, :cw][None, :, :]).reshape((r1 - r0) * cw, B)
                    for p in range(P):
                        sel = pn == p
                        ref[m, q0:q0 + (r1 - r0) * cw, p] = (
                            part[:, sel] * wn[m, sel]).sum(axis=1)
            np.testing.assert_allclose(out, ref, rtol=1e-11, atol=1e-12)
            assert np.abs(out[..., P:]).max() == 0.0

"""Out-of-core (streaming) EM training.

The reference exposes ``Dataset.chunks``/``concat`` for "user-driven
out-of-core workflows" (`src/python_bindings.rs:110-133`, SURVEY.md §2.5) but
leaves the accumulation to the user.  Here the EM makes it first-class: the
sufficient statistics of one iteration (ops/masked_linalg.EMStats) are
*additive over samples*, so a dataset far larger than device memory trains by
streaming host-resident chunks through the jitted statistics pass and summing
the (tiny) results — one device-resident chunk at a time, mathematically
identical to a single-shot ``iterate`` over the concatenated data.

    chunks = [Dataset(part) for part in parts]           # host numpy inside
    model = StreamingPPCATrainer(chunks).train(state_size=16, n_iters=10)

Each chunk may be a :class:`Dataset` or a zero-argument callable returning
one (for lazy loading from disk / object storage).

Chunks may also be DATA-axis mesh-sharded (parallel.shard_dataset): each
sharded chunk runs the shard_map statistics pass with a data-axis psum, so a
multi-chip fleet streams a dataset larger than its combined device memory.
Model-axis-sharded chunks are rejected (their D-indexed statistics are
device-local, which the host-side accumulator cannot see).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import block_size_for
from .dataset import Dataset
from .models.ppca import PPCAModel, _precision
from .ops import masked_linalg as ml
from .prior import Prior
from .trainer import Metric, MetricsCallback, TrainMetrics, _maybe_checkpoint
from .utils.profiling import trace

ChunkLike = Union[Dataset, Callable[[], Dataset]]


@functools.partial(jax.jit, static_argnames=("block_size",))
def _stats_jit(C, mean, sigma, data, mask, weights, block_size):
    return ml.em_stats(C, mean, sigma, data, mask, weights, block_size=block_size)


@functools.partial(jax.jit, static_argnames=("block_size",))
def _stats_pat_jit(C, mean, sigma, data, mask, pidx, pats, weights, block_size):
    from .ops import pattern_dedup as pd

    return pd.em_stats(C, mean, sigma, data, mask, pidx, pats, weights,
                       block_size=block_size)


@functools.partial(jax.jit, static_argnames=("block_size",))
def _stats_dense_jit(C, mean, sigma, data, weights, block_size):
    from .ops import dense_fast as df

    return _dense_to_masked_stats(
        df.em_stats(C, mean, sigma, data, weights, block_size=block_size)
    )


def _dense_to_masked_stats(st) -> ml.EMStats:
    """DenseEMStats -> the common EMStats the streaming accumulator sums:
    every output row shares the one (k, k) second moment (S[d] = S_common
    exactly, since all masks are 1) and the per-dim observed-weight totals
    collapse to w_sum.  Lets dense chunks mix with masked/pattern ones."""
    D_loc = st.cross.shape[0]
    S = jnp.broadcast_to(st.S_common.reshape(1, -1), (D_loc, st.S_common.size))
    totals = jnp.full((D_loc,), st.w_sum, st.cross.dtype)
    return ml.EMStats(st.cross, S, st.square_error, st.dev_sq,
                      st.total_dev, totals, st.llk)


@jax.jit
def _stats_add(a: ml.EMStats, b: ml.EMStats) -> ml.EMStats:
    return jax.tree.map(jnp.add, a, b)


@functools.partial(jax.jit, static_argnames=())
def _finalize_jit(C, mean, sigma, stats, tprec, noise_prior, mean_prior):
    return ml.em_finalize(
        C, mean, sigma, stats,
        transformation_precision=tprec,
        noise_prior=noise_prior,
        mean_prior=mean_prior,
    )


def _resolve(chunk: ChunkLike) -> Dataset:
    return chunk() if callable(chunk) else chunk


def _data_mesh_or_raise(ds: Dataset):
    """The chunk's data-parallel mesh, or None for resident chunks; rejects
    model-axis sharding (D-indexed statistics would be device-local)."""
    from .parallel.mesh import MODEL_AXIS, dataset_mesh

    mesh = dataset_mesh(ds)
    if (mesh is not None and MODEL_AXIS in mesh.axis_names
            and mesh.shape[MODEL_AXIS] > 1):
        raise ValueError(
            "streaming chunks may be data-axis sharded only (model-axis "
            "sharding keeps D-indexed statistics device-local)"
        )
    return mesh


def _chunk_stats(model: PPCAModel, ds: Dataset) -> ml.EMStats:
    """EM statistics of one chunk, per-chunk fast-path dispatch mirroring
    _impl_and_block: fully-observed chunks take the dense pass (converted to
    the common EMStats shape), structured-missingness chunks the pattern
    tables, the rest the general masked pass — each single-device or
    shard_map'd (data-axis psum) when the chunk lives on a mesh."""
    from .parallel.mesh import DATA_AXIS

    mesh = _data_mesh_or_raise(ds)
    args = (model._transform, model._mean, model._isotropic_noise)
    if mesh is None:
        block = block_size_for(ds.padded_len, model.state_size)
        if ds.all_observed():
            return _stats_dense_jit(*args, ds.data, ds.weights_dev, block)
        pat = ds.pattern_info()
        if pat is not None:
            return _stats_pat_jit(*args, ds.data, ds.mask, pat[0], pat[1],
                                  ds.weights_dev, block)
        return _stats_jit(*args, ds.data, ds.mask, ds.weights_dev, block)

    from .parallel.api import fns_for

    block = block_size_for(max(1, ds.padded_len // mesh.shape[DATA_AXIS]),
                           model.state_size)
    if ds.all_observed():
        return _dense_to_masked_stats(
            fns_for(mesh, False, dense=True)["em_stats"](
                *args, ds.data, ds.mask, ds.weights_dev, block,
            )
        )
    fns = fns_for(mesh, False)
    pat = ds.pattern_info()
    if pat is not None:
        return fns["em_stats_pat"](
            *args, ds.data, ds.mask, ds.weights_dev, pat[0], pat[1], block,
        )
    return fns["em_stats"](*args, ds.data, ds.mask, ds.weights_dev, block)


def _accumulate(chunks, stats_fn, add_fn, prefetch: int = 1):
    """Resolve chunks one at a time, accumulating their statistics.

    Lazily-loaded chunks must not all enqueue at once (every in-flight
    statistics program pins its chunk's device buffers — the memory blow-up
    streaming exists to avoid), so the loop blocks on the running total —
    but LAGGED by ``prefetch`` chunks: while the device works on chunk i,
    the host resolves and enqueues chunks i+1..i+prefetch.  ``prefetch=0``
    is the fully-synchronous round-4 behavior (one chunk resident at a
    time); the default 1 keeps at most two chunks' buffers alive and
    removes the per-chunk pipeline drain (measured 10M north star:
    ~1.6 s/iter of sync cost at 10x1M chunks).  Pre-resident Dataset
    chunks keep full async overlap regardless."""
    if not len(chunks):
        raise ValueError("need at least one chunk")
    if prefetch < 0:
        raise ValueError("prefetch must be >= 0")
    n_samples = 0
    total = None
    pending: list = []  # running totals awaiting their lagged sync
    for chunk in chunks:
        ds = _resolve(chunk)
        n_samples += len(ds)
        stats = stats_fn(ds)
        del ds
        total = stats if total is None else add_fn(total, stats)
        if callable(chunk):
            pending.append(total)
            if len(pending) > prefetch:
                jax.block_until_ready(pending.pop(0).llk)
    return total, n_samples


def _train_loop(model0, chunks, iterate_fn, prior, n_iters, metric, quiet,
                callback, label, profile_dir=None, checkpoint_path=None,
                checkpoint_every=10, prefetch=1):
    """The shared trainer driver: n_iters streamed iterations with the
    reference's per-iteration metric printing/callback, plus the in-memory
    trainers' checkpoint/profile hooks (trainer.py:92-106) — the streaming
    path is the one most likely to run long enough to need them."""
    model = model0
    n = None  # counted during the first streamed pass — no extra I/O
    with trace(profile_dir):
        for idx in range(n_iters):
            n_out: list = []
            new_model, llk = iterate_fn(model, chunks, prior, _n_out=n_out,
                                        prefetch=prefetch)
            n = n if n is not None else n_out[0]
            if not quiet or callback is not None:
                metrics = TrainMetrics.compute(llk, model.n_parameters, n)
                if callback is not None:
                    callback(idx + 1, metrics)
                if not quiet:
                    print(f"{label} iteration {idx + 1}: "
                          f"{metric}={getattr(metrics, metric)}")
            model = new_model
            _maybe_checkpoint(model, idx + 1, n_iters, checkpoint_path,
                              checkpoint_every)
    return model.to_canonical()


def iterate_streamed(
    model: PPCAModel,
    chunks: Sequence[ChunkLike],
    prior: Optional[Prior] = None,
    _n_out: Optional[list] = None,
    prefetch: int = 1,
):
    """One EM iteration over a stream of chunks.  Returns
    ``(new_model, llk)`` where llk is the total log-likelihood of ``model``
    over all chunks — identical to ``model._iterate_with_llk`` on the
    concatenated dataset.  ``prefetch`` bounds how many lazy chunks may be
    in flight beyond the one computing (see :func:`_accumulate`)."""
    dtype = model._transform.dtype
    prior = prior if prior is not None else Prior()
    tprec, noise_prior, mean_prior = prior.device_pieces(dtype)

    with _precision(model.output_size):
        total, n_samples = _accumulate(
            chunks, lambda ds: _chunk_stats(model, ds), _stats_add,
            prefetch=prefetch,
        )
        new_C, new_mean, new_sigma = _finalize_jit(
            model._transform, model._mean, model._isotropic_noise,
            total, tprec, noise_prior, mean_prior,
        )
    if _n_out is not None:
        _n_out.append(n_samples)
    return PPCAModel._from_params(new_C, new_mean, new_sigma), float(total.llk)


class StreamingPPCATrainer:
    """Train a PPCA model over chunks that never need to coexist in device
    memory.  API mirrors :class:`ppca_rs_tpu.PPCATrainer`."""

    def __init__(self, chunks: Sequence[ChunkLike]):
        self.chunks = list(chunks)
        if not self.chunks:
            raise ValueError("need at least one chunk")

    def train(
        self,
        *,
        start: Optional[PPCAModel] = None,
        prior: Optional[Prior] = None,
        state_size: int,
        n_iters: int = 10,
        metric: Metric = "aic",
        quiet: bool = False,
        callback: Optional[MetricsCallback] = None,
        key=None,
        profile_dir: Optional[str] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 10,
        prefetch: int = 1,
    ) -> PPCAModel:
        """``prefetch``: lazy chunks allowed in flight beyond the one the
        device is computing (default 1 — at most two chunks' buffers alive;
        0 restores strictly one-resident-chunk memory)."""
        if start is not None:
            model = start  # warm start: no chunk I/O before the first pass
        else:
            model = PPCAModel.init(state_size, _resolve(self.chunks[0]), key=key)
        return _train_loop(model, self.chunks, iterate_streamed, prior,
                           n_iters, metric, quiet, callback, "Masked PPCA",
                           profile_dir, checkpoint_path, checkpoint_every,
                           prefetch)


# ===================================================================== #
# Mixture streaming: MixEMStats are additive over chunks too (the weight-
# normalization term resp_max combines by max — exactly how the sharded
# path combines it across devices), so out-of-core mixture EM is the same
# accumulate-then-finalize shape as the single-model path.

def _mix_chunk_stats(mix, Cs, means, sigmas, ds: Dataset):
    from .parallel.mesh import DATA_AXIS

    mesh = _data_mesh_or_raise(ds)
    if mesh is None:
        block = block_size_for(max(1, ds.padded_len // max(1, len(mix._models))),
                               int(Cs.shape[2]), m=len(mix._models))
        pat = mix._pattern(ds)
        if pat is not None:
            return _mix_stats_pat_jit(
                Cs, means, sigmas, mix._log_weights,
                ds.data, ds.mask, pat[0], pat[1], ds.weights_dev, block,
            )
        return _mix_stats_jit(
            Cs, means, sigmas, mix._log_weights,
            ds.data, ds.mask, ds.weights_dev, block,
        )
    from .parallel.api import fns_for

    block = block_size_for(
        max(1, ds.padded_len // (mesh.shape[DATA_AXIS] * max(1, len(mix._models)))),
        int(Cs.shape[2]), m=len(mix._models),
    )
    fns = fns_for(mesh, False)
    pat = mix._pattern(ds)
    if pat is not None:
        return fns["mix_em_stats_pat"](
            Cs, means, sigmas, mix._log_weights,
            ds.data, ds.mask, ds.weights_dev, pat[0], pat[1], block,
        )
    return fns["mix_em_stats"](
        Cs, means, sigmas, mix._log_weights,
        ds.data, ds.mask, ds.weights_dev, block,
    )


@functools.partial(jax.jit, static_argnames=("block_size",))
def _mix_stats_jit(Cs, means, sigmas, log_weights, data, mask, weights, block_size):
    from .ops import mix_fused as mf

    return mf.mix_em_stats(Cs, means, sigmas, log_weights, data, mask,
                           weights, block_size=block_size)


@functools.partial(jax.jit, static_argnames=("block_size",))
def _mix_stats_pat_jit(Cs, means, sigmas, log_weights, data, mask, pidx, pats,
                       weights, block_size):
    from .ops import mix_fused as mf

    return mf.mix_em_stats_pat(Cs, means, sigmas, log_weights, data, mask,
                               pidx, pats, weights, block_size=block_size)


@jax.jit
def _mix_stats_add(a, b):
    from .ops.mix_fused import MixEMStats

    return MixEMStats(*(
        jnp.maximum(x, y) if name == "resp_max" else jnp.add(x, y)
        for name, x, y in zip(a._fields, a, b)
    ))


def iterate_mix_streamed(mix, chunks: Sequence[ChunkLike],
                         prior: Optional[Prior] = None,
                         _n_out: Optional[list] = None,
                         prefetch: int = 1):
    """One fused mixture EM iteration over a stream of chunks — identical to
    ``mix._iterate_with_llk`` on the concatenated dataset.  Chunks may be
    resident, lazy callables, or data-axis mesh-sharded, mixed freely."""
    from .models.mix import PPCAMix, _precision

    dtype = mix._models[0]._transform.dtype
    prior = prior if prior is not None else Prior()
    tprec, noise_prior, mean_prior = prior.device_pieces(dtype)
    Cs, means, sigmas = mix._stacked_params()

    with _precision(mix.output_size):
        total, n_samples = _accumulate(
            chunks,
            lambda ds: _mix_chunk_stats(mix, Cs, means, sigmas, ds),
            _mix_stats_add,
            prefetch=prefetch,
        )
        new_Cs, new_means, new_sigmas, new_logw = _mix_finalize_jit(
            Cs, means, sigmas, total, tprec, noise_prior, mean_prior,
        )
    if _n_out is not None:
        _n_out.append(n_samples)
    new_models = [
        PPCAModel._from_params(
            new_Cs[i][:, : m.state_size], new_means[i], new_sigmas[i]
        )
        for i, m in enumerate(mix._models)
    ]
    return PPCAMix(new_models, new_logw), float(total.llk)


@jax.jit
def _mix_finalize_jit(Cs, means, sigmas, stats, tprec, noise_prior, mean_prior):
    from .ops import mix_fused as mf

    return mf.mix_em_finalize(
        Cs, means, sigmas, stats,
        transformation_precision=tprec,
        noise_prior=noise_prior,
        mean_prior=mean_prior,
    )


class StreamingPPCAMixTrainer:
    """Train a PPCA mixture over chunks that never need to coexist in device
    memory.  API mirrors :class:`ppca_rs_tpu.PPCAMixTrainer`."""

    def __init__(self, chunks: Sequence[ChunkLike]):
        self.chunks = list(chunks)
        if not self.chunks:
            raise ValueError("need at least one chunk")

    def train(
        self,
        *,
        start=None,
        prior: Optional[Prior] = None,
        n_models: int,
        state_size: int,
        n_iters: int = 10,
        metric: Metric = "aic",
        quiet: bool = False,
        callback: Optional[MetricsCallback] = None,
        key=None,
        profile_dir: Optional[str] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 10,
        prefetch: int = 1,
    ):
        """``prefetch``: see :meth:`StreamingPPCATrainer.train`."""
        from .models.mix import PPCAMix

        if start is not None:
            mix = start  # warm start: no chunk I/O before the first pass
        else:
            mix = PPCAMix.init(n_models, state_size, _resolve(self.chunks[0]),
                               key=key)
        return _train_loop(mix, self.chunks, iterate_mix_streamed, prior,
                           n_iters, metric, quiet, callback, "Masked PPCA mix",
                           profile_dir, checkpoint_path, checkpoint_every,
                           prefetch)

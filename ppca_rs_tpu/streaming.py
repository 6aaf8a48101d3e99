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
from .trainer import Metric, MetricsCallback, TrainMetrics

ChunkLike = Union[Dataset, Callable[[], Dataset]]


@functools.partial(jax.jit, static_argnames=("block_size",))
def _stats_jit(C, mean, sigma, data, mask, weights, block_size):
    return ml.em_stats(C, mean, sigma, data, mask, weights, block_size=block_size)


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


def _chunk_stats(model: PPCAModel, ds: Dataset):
    """EM statistics of one chunk: the single-device pass, or the sharded
    (data-axis psum) pass when the chunk's arrays live on a mesh."""
    from .parallel.mesh import DATA_AXIS, MODEL_AXIS, dataset_mesh

    mesh = dataset_mesh(ds)
    if mesh is None:
        return _stats_jit(
            model._transform, model._mean, model._isotropic_noise,
            ds.data, ds.mask, ds.weights_dev,
            block_size_for(ds.padded_len),
        )
    if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1:
        raise ValueError(
            "streaming chunks may be data-axis sharded only (model-axis "
            "sharding keeps D-indexed statistics device-local)"
        )
    from .parallel.api import fns_for

    return fns_for(mesh, False)["em_stats"](
        model._transform, model._mean, model._isotropic_noise,
        ds.data, ds.mask, ds.weights_dev,
        block_size_for(max(1, ds.padded_len // mesh.shape[DATA_AXIS])),
    )


def iterate_streamed(
    model: PPCAModel,
    chunks: Sequence[ChunkLike],
    prior: Optional[Prior] = None,
    _n_out: Optional[list] = None,
):
    """One EM iteration over a stream of chunks.  Returns
    ``(new_model, llk)`` where llk is the total log-likelihood of ``model``
    over all chunks — identical to ``model._iterate_with_llk`` on the
    concatenated dataset."""
    if not len(chunks):
        raise ValueError("need at least one chunk")
    dtype = model._transform.dtype
    prior = prior if prior is not None else Prior()
    tprec, noise_prior, mean_prior = prior.device_pieces(dtype)

    n_samples = 0
    total = None
    with _precision(model.output_size):
        for chunk in chunks:
            ds = _resolve(chunk)
            n_samples += len(ds)
            stats = _chunk_stats(model, ds)
            del ds
            total = stats if total is None else _stats_add(total, stats)
            if callable(chunk):
                # Lazily-loaded chunk: wait for its statistics so its device
                # buffers are reclaimable before the next chunk materializes
                # (the point of streaming). Pre-resident Dataset chunks keep
                # full async overlap.
                jax.block_until_ready(total.llk)
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
    ) -> PPCAModel:
        first = _resolve(self.chunks[0])
        model = start if start is not None else PPCAModel.init(state_size, first, key=key)
        del first
        n = None  # counted during the first streamed pass — no extra I/O

        for idx in range(n_iters):
            n_out: list = []
            new_model, llk = iterate_streamed(model, self.chunks, prior, _n_out=n_out)
            n = n if n is not None else n_out[0]
            if not quiet or callback is not None:
                metrics = TrainMetrics.compute(llk, model.n_parameters, n)
                if callback is not None:
                    callback(idx + 1, metrics)
                if not quiet:
                    print(
                        f"Masked PPCA iteration {idx + 1}: "
                        f"{metric}={getattr(metrics, metric)}"
                    )
            model = new_model

        return model.to_canonical()


# ===================================================================== #
# Mixture streaming: MixEMStats are additive over chunks too (the weight-
# normalization term resp_max combines by max — exactly how the sharded
# path combines it across devices), so out-of-core mixture EM is the same
# accumulate-then-finalize shape as the single-model path.

def _mix_chunk_stats(mix, Cs, means, sigmas, ds: Dataset):
    from .parallel.mesh import DATA_AXIS, MODEL_AXIS, dataset_mesh

    mesh = dataset_mesh(ds)
    if mesh is None:
        block = block_size_for(max(1, ds.padded_len // max(1, len(mix._models))))
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
    if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1:
        raise ValueError(
            "streaming chunks may be data-axis sharded only (model-axis "
            "sharding keeps D-indexed statistics device-local)"
        )
    from .parallel.api import fns_for

    block = block_size_for(
        max(1, ds.padded_len // (mesh.shape[DATA_AXIS] * max(1, len(mix._models))))
    )
    return fns_for(mesh, False)["mix_em_stats"](
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
                         _n_out: Optional[list] = None):
    """One fused mixture EM iteration over a stream of chunks — identical to
    ``mix._iterate_with_llk`` on the concatenated dataset.  Chunks may be
    resident, lazy callables, or data-axis mesh-sharded, mixed freely."""
    from .models.mix import PPCAMix, _precision
    from .ops import mix_fused as mf

    if not len(chunks):
        raise ValueError("need at least one chunk")
    dtype = mix._models[0]._transform.dtype
    prior = prior if prior is not None else Prior()
    tprec, noise_prior, mean_prior = prior.device_pieces(dtype)
    Cs, means, sigmas = mix._stacked_params()

    n_samples = 0
    total = None
    with _precision(mix.output_size):
        for chunk in chunks:
            ds = _resolve(chunk)
            n_samples += len(ds)
            stats = _mix_chunk_stats(mix, Cs, means, sigmas, ds)
            del ds
            total = stats if total is None else _mix_stats_add(total, stats)
            if callable(chunk):
                jax.block_until_ready(total.llk)
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
    ):
        from .models.mix import PPCAMix

        first = _resolve(self.chunks[0])
        mix = start if start is not None else PPCAMix.init(
            n_models, state_size, first, key=key
        )
        del first
        n = None

        for idx in range(n_iters):
            n_out: list = []
            new_mix, llk = iterate_mix_streamed(mix, self.chunks, prior, _n_out=n_out)
            n = n if n is not None else n_out[0]
            if not quiet or callback is not None:
                metrics = TrainMetrics.compute(llk, mix.n_parameters, n)
                if callback is not None:
                    callback(idx + 1, metrics)
                if not quiet:
                    print(
                        f"Masked PPCA mix iteration {idx + 1}: "
                        f"{metric}={getattr(metrics, metric)}"
                    )
            mix = new_mix

        return mix.to_canonical()

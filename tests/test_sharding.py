"""Distribution tests on a virtual 8-device CPU mesh.

The same jitted EM/llk under shard_map with NamedSharding must agree with the
single-device path to f64 tolerance (SURVEY.md §4 multi-node testing note) —
including N that does not divide the mesh (neutral-row padding) and 2D
(data x model) meshes that shard the output dimension.
"""

import numpy as np
import pytest

import jax

from ppca_rs_tpu import Dataset, PPCAMix, PPCAModel, Prior
from ppca_rs_tpu.parallel.mesh import dataset_mesh, make_mesh, shard_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_data(rng, n=101, d=8, k=3):
    C = rng.normal(size=(d, k))
    mean = rng.normal(size=d)
    data = rng.normal(size=(n, d)) + mean
    mask = rng.random((n, d)) > 0.3
    mask[5] = False
    data = np.where(mask, data, np.nan)
    weights = rng.random(n) + 0.5
    return PPCAModel(isotropic_noise=0.4, transform=C, mean=mean), Dataset(data, weights=weights)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(rng, mesh_shape):
    model, ds = make_data(rng)
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sds = shard_dataset(ds, mesh)
    assert dataset_mesh(sds) is mesh or dataset_mesh(sds).shape == mesh.shape
    assert len(sds) == len(ds)

    # llk / llks
    assert np.isclose(model.llk(sds), model.llk(ds), rtol=1e-10)
    np.testing.assert_allclose(model.llks(sds), model.llks(ds), rtol=1e-10)

    # posterior
    inf_s = model.infer(sds)
    inf_d = model.infer(ds)
    np.testing.assert_allclose(inf_s.states(), inf_d.states(), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        inf_s.covariances_array(), inf_d.covariances_array(), rtol=1e-8, atol=1e-12
    )

    # readouts
    np.testing.assert_allclose(model.smooth(sds).numpy(), model.smooth(ds).numpy(), rtol=1e-8)
    np.testing.assert_allclose(
        model.extrapolate(sds).numpy(), model.extrapolate(ds).numpy(), rtol=1e-8
    )

    # EM step (plain)
    m_s = model.iterate(sds)
    m_d = model.iterate(ds)
    np.testing.assert_allclose(m_s.transform, m_d.transform, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(m_s.mean, m_d.mean, rtol=1e-8, atol=1e-12)
    assert np.isclose(m_s.isotropic_noise, m_d.isotropic_noise, rtol=1e-10)


def test_sharded_em_with_priors(rng):
    model, ds = make_data(rng, n=64, d=8, k=2)
    mesh = make_mesh(data=4, model=2)
    sds = shard_dataset(ds, mesh)
    prior = (
        Prior()
        .with_isotropic_noise_prior(3.0, 2.0)
        .with_transformation_precision(0.5)
        .with_mean_prior(rng.normal(size=8), np.eye(8) * 0.7)
    )
    m_s = model.iterate_with_prior(sds, prior)
    m_d = model.iterate_with_prior(ds, prior)
    np.testing.assert_allclose(m_s.transform, m_d.transform, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(m_s.mean, m_d.mean, rtol=1e-8, atol=1e-12)
    assert np.isclose(m_s.isotropic_noise, m_d.isotropic_noise, rtol=1e-10)


def test_sharded_mixture_em(rng):
    _, ds = make_data(rng, n=48, d=8, k=2)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(ds, mesh)
    mix = PPCAMix.init(2, 2, ds, key=jax.random.PRNGKey(0))
    m_s = mix.iterate(sds)
    m_d = mix.iterate(ds)
    np.testing.assert_allclose(m_s.log_weights, m_d.log_weights, rtol=1e-8)
    for a, b in zip(m_s.models, m_d.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-7, atol=1e-10)
    assert np.isclose(m_s.llk(sds), m_d.llk(ds), rtol=1e-9)


def test_sharded_pattern_dedup_matches(rng):
    """Data-axis-sharded datasets with few mask patterns route through the
    sharded pattern-table verbs and agree with the unsharded general path."""
    n, d, k, P = 101, 8, 3, 4
    pats = rng.random((P, d)) < 0.6
    pats[0] = False
    idx = rng.integers(0, P, size=n)
    values = rng.normal(size=(n, d))
    values[~pats[idx]] = np.nan
    weights = rng.random(n) + 0.5
    model = PPCAModel(
        isotropic_noise=0.4, transform=rng.normal(size=(d, k)), mean=rng.normal(size=d)
    )
    ds = Dataset(values, weights=weights)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(Dataset(values, weights=weights), mesh)

    info = sds.pattern_info()
    assert info is not None, "sharded detection must trigger"
    np.testing.assert_array_equal(
        np.asarray(sds.mask), np.asarray(info[1])[np.asarray(info[0])]
    )

    assert np.isclose(model.llk(sds), model.llk(ds), rtol=1e-10)
    np.testing.assert_allclose(model.llks(sds), model.llks(ds), rtol=1e-9, atol=1e-11)
    inf_s, inf_d = model.infer(sds), model.infer(ds)
    np.testing.assert_allclose(inf_s.states(), inf_d.states(), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        inf_s.covariances_array(), inf_d.covariances_array(), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        model.extrapolate(sds).numpy(), model.extrapolate(ds).numpy(),
        rtol=1e-8, equal_nan=True,
    )
    prior = Prior().with_isotropic_noise_prior(2.0, 2.0).with_transformation_precision(0.1)
    m_s = model.iterate_with_prior(sds, prior)
    m_d = model.iterate_with_prior(ds, prior)
    np.testing.assert_allclose(m_s.transform, m_d.transform, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(m_s.mean, m_d.mean, rtol=1e-8, atol=1e-11)
    assert np.isclose(m_s.isotropic_noise, m_d.isotropic_noise, rtol=1e-9)

    # model-axis sharding keeps the general path
    mesh2 = make_mesh(data=4, model=2)
    sds2 = shard_dataset(Dataset(values, weights=weights), mesh2)
    assert sds2.pattern_info() is None
    assert np.isclose(model.llk(sds2), model.llk(ds), rtol=1e-10)


def test_sharded_pattern_sorted_em_matches(rng, monkeypatch):
    """Data-axis-sharded EM through the balanced sorted-segment layout
    (Dataset.pattern_order_sharded): every shard gets identical static
    per-pattern counts via ceil padding with zero-weight duplicate rows,
    and the psum'd statistics match the unsharded path exactly.  Uses
    N=101 over 8 shards so BOTH padding kinds are live (shard_dataset's
    all-masked neutral rows AND the sorted layout's duplicate slots)."""
    from ppca_rs_tpu.config import config

    monkeypatch.setattr(config, "pat_sorted_min_rows", 0)  # tiny parity shapes
    n, d, k, P = 101, 8, 3, 4
    pats = rng.random((P, d)) < 0.6
    pats[0] = False                       # all-masked pattern in the mix
    idx = rng.integers(0, P, size=n)
    values = rng.normal(size=(n, d))
    values[~pats[idx]] = np.nan
    weights = rng.random(n) + 0.5
    model = PPCAModel(
        isotropic_noise=0.4, transform=rng.normal(size=(d, k)),
        mean=rng.normal(size=d),
    )
    ds = Dataset(values, weights=weights)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(Dataset(values, weights=weights), mesh)
    assert config.pat_sorted_estep, "default flipped? keep the gate in sync"
    order = sds.pattern_order_sharded()
    assert order is not None, "sharded sorted layout must engage"
    data_s, perm, valid, counts = order
    S = 8
    assert data_s.shape[0] == S * sum(counts)
    # every pattern ceil-balanced: counts_local * S >= global count
    pidx_h = np.asarray(sds.pattern_info()[0])
    glob = np.bincount(pidx_h, minlength=P)
    assert all(S * c >= g for c, g in zip(counts, glob))
    # valid slots count exactly the real rows
    assert int(np.asarray(valid).sum()) == sds.padded_len

    m_s = model.iterate(sds)
    m_d = model.iterate(ds)
    np.testing.assert_allclose(m_s.transform, m_d.transform, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(m_s.mean, m_d.mean, rtol=1e-9, atol=1e-12)
    assert np.isclose(m_s.isotropic_noise, m_d.isotropic_noise, rtol=1e-10)
    mn_s, llks_s = model.iterate_n(sds, 5)
    mn_d, llks_d = model.iterate_n(ds, 5)
    np.testing.assert_allclose(np.asarray(llks_s), np.asarray(llks_d), rtol=1e-10)
    np.testing.assert_allclose(mn_s.transform, mn_d.transform, rtol=1e-8, atol=1e-12)
    # with_weights twin reuses the cached sorted copy; weights re-sort per call
    w2 = rng.random(n) + 0.1
    sds2 = sds.with_weights(w2)
    assert sds2._pattern_order_sharded is sds._pattern_order_sharded
    m2_s = model.iterate(sds2)
    m2_d = model.iterate(ds.with_weights(w2))
    np.testing.assert_allclose(m2_s.transform, m2_d.transform, rtol=1e-9, atol=1e-12)


def test_sharded_pattern_sorted_mixture_em_matches(rng, monkeypatch):
    """Sharded sorted-segment MIXTURE EM (mix_em_step_pat_sorted /
    mix_em_n_pat_sorted): the balanced layout's zero-weight duplicate rows
    are neutral in every mixture statistic including the weight-scaled
    resp_max (pmax-combined), so sharded == unsharded exactly."""
    from ppca_rs_tpu.config import config

    monkeypatch.setattr(config, "pat_sorted_min_rows", 0)  # tiny parity shapes
    n, d, k, P, M = 203, 8, 3, 4, 3
    pats = rng.random((P, d)) < 0.6
    idx = rng.integers(0, P, size=n)
    values = rng.normal(size=(n, d))
    values[~pats[idx]] = np.nan
    weights = rng.random(n) + 0.5
    models = [
        PPCAModel(isotropic_noise=0.3 + 0.1 * i,
                  transform=rng.normal(size=(d, k)), mean=rng.normal(size=d))
        for i in range(M)
    ]
    mix = PPCAMix(models, np.log(np.array([0.5, 0.3, 0.2])))
    ds = Dataset(values, weights=weights)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(Dataset(values, weights=weights), mesh)
    assert sds.pattern_order_sharded() is not None
    m_s = mix.iterate(sds)
    m_d = mix.iterate(ds)
    np.testing.assert_allclose(
        np.asarray(m_s.log_weights), np.asarray(m_d.log_weights),
        rtol=1e-9, atol=1e-12,
    )
    for a, b in zip(m_s.models, m_d.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-8, atol=1e-11)
        assert np.isclose(a.isotropic_noise, b.isotropic_noise, rtol=1e-9)
    ms_n, llks_s = mix.iterate_n(sds, 4)
    md_n, llks_d = mix.iterate_n(ds, 4)
    np.testing.assert_allclose(np.asarray(llks_s), np.asarray(llks_d), rtol=1e-10)


def test_shard_dataset_requires_divisible_d(rng):
    _, ds = make_data(rng, n=16, d=7)
    mesh = make_mesh(data=4, model=2)
    with pytest.raises(ValueError):
        shard_dataset(ds, mesh)


def test_sharded_dataset_roundtrips(rng):
    _, ds = make_data(rng, n=101, d=8)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(ds, mesh)
    assert len(sds) == 101
    assert sds.padded_len == 104
    np.testing.assert_allclose(sds.numpy(), ds.numpy())
    np.testing.assert_allclose(sds.weights_numpy(), ds.weights_numpy())


def test_padded_dataset_readouts(rng):
    """extrapolated/CI readouts on padded sharded datasets (regression: these
    mixed trimmed posteriors with untrimmed padded masks)."""
    model, ds = make_data(rng, n=101, d=8, k=3)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(ds, mesh)
    assert sds.padded_len != len(sds)

    inf = model.infer(sds)
    extr = inf.extrapolated(model, sds)
    assert extr.numpy().shape == (101, 8)
    ci = inf.extrapolated_covariances_diagonal(model, sds)
    assert ci.numpy().shape == (101, 8)
    full = inf.extrapolated_covariances(model, sds)
    assert len(full) == 101

    ref_inf = model.infer(ds)
    np.testing.assert_allclose(
        extr.numpy(), ref_inf.extrapolated(model, ds).numpy(), rtol=1e-8
    )

    # mixture variants over the padded dataset
    mix = PPCAMix([model, model], np.zeros(2))
    minf = mix.infer(sds)
    assert minf.extrapolated(mix, sds).numpy().shape == (101, 8)
    assert minf.extrapolated_covariances_diagonal(mix, sds).numpy().shape == (101, 8)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_mixture_inference_fused(rng, mesh_shape):
    """Sharded mixture infer/smooth/extrapolate run the SAME fused one-pass
    verbs under shard_map (round 3; previously a per-component fallback of
    M+1 device programs) and agree with the unsharded path."""
    _, ds = make_data(rng, n=101, d=8, k=2)
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sds = shard_dataset(ds, mesh)
    mix = PPCAMix.init(3, 2, ds, key=jax.random.PRNGKey(3))

    inf_s = mix.infer(sds)
    inf_d = mix.infer(ds)
    np.testing.assert_allclose(
        np.asarray(inf_s.log_posteriors()), np.asarray(inf_d.log_posteriors()),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(inf_s.states()), np.asarray(inf_d.states()),
        rtol=1e-7, atol=1e-10,
    )
    np.testing.assert_allclose(
        mix.smooth(sds).numpy(), mix.smooth(ds).numpy(), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        mix.extrapolate(sds).numpy(), mix.extrapolate(ds).numpy(),
        rtol=1e-8, atol=1e-10,
    )


def test_sharded_mixture_inference_pattern(rng):
    """Data-axis-sharded mixture inference with few mask patterns routes
    through the sharded *_pat fused verbs and matches unsharded."""
    n, d, k, P = 101, 8, 2, 3
    pats = rng.random((P, d)) > 0.3
    pats[:, 0] = True
    pidx = rng.integers(0, P, size=n)
    data = rng.normal(size=(n, d))
    data = np.where(pats[pidx], data, np.nan)
    ds = Dataset(data)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(ds, mesh)
    mix = PPCAMix.init(2, k, ds, key=jax.random.PRNGKey(5))

    assert sds.pattern_info() is not None  # the sharded table path is live
    np.testing.assert_allclose(mix.llks(sds), mix.llks(ds), rtol=1e-8, atol=1e-10)
    assert np.isclose(mix.llk(sds), mix.llk(ds), rtol=1e-9)
    inf_s = mix.infer(sds)
    inf_d = mix.infer(ds)
    np.testing.assert_allclose(
        np.asarray(inf_s.log_posteriors()), np.asarray(inf_d.log_posteriors()),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        mix.smooth(sds).numpy(), mix.smooth(ds).numpy(), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        mix.extrapolate(sds).numpy(), mix.extrapolate(ds).numpy(),
        rtol=1e-8, atol=1e-10,
    )


def test_sharded_mixture_em_pattern(rng):
    """Data-axis-sharded mixture EM with few mask patterns routes through
    the sharded mix_em_step_pat/mix_em_n_pat verbs (parallel/api.py) and
    matches the unsharded table path — the M x P table speedup survives
    sharding (VERDICT r3 weak #4)."""
    n, d, k, P = 96, 8, 2, 3
    pats = rng.random((P, d)) > 0.3
    pats[:, 0] = True
    pidx = rng.integers(0, P, size=n)
    data = rng.normal(size=(n, d))
    data = np.where(pats[pidx], data, np.nan)
    weights = rng.random(n) + 0.5
    ds = Dataset(data, weights=weights)
    mesh = make_mesh(data=8, model=1)
    sds = shard_dataset(Dataset(data, weights=weights), mesh)
    mix = PPCAMix.init(2, k, ds, key=jax.random.PRNGKey(7))

    assert sds.pattern_info() is not None  # the sharded EM table path is live
    prior = Prior().with_isotropic_noise_prior(2.0, 2.0)
    m_s = mix.iterate_with_prior(sds, prior)
    m_d = mix.iterate_with_prior(ds, prior)
    np.testing.assert_allclose(m_s.log_weights, m_d.log_weights, rtol=1e-8)
    for a, b in zip(m_s.models, m_d.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-7, atol=1e-10)
        assert np.isclose(a.isotropic_noise, b.isotropic_noise, rtol=1e-8)

    m_sn, llks_s = mix.iterate_n(sds, 3)
    m_dn, llks_d = mix.iterate_n(ds, 3)
    np.testing.assert_allclose(llks_s, llks_d, rtol=1e-8)
    for a, b in zip(m_sn.models, m_dn.models):
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-6, atol=1e-9)

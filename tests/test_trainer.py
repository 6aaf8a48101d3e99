"""Trainer tests (`python/ppca_rs/__init__.py:21-118` behavior)."""

import numpy as np

from ppca_rs_tpu import Dataset, PPCAMixTrainer, PPCATrainer, PPCAModel, Prior, TrainMetrics


def ground_truth():
    return PPCAModel(
        isotropic_noise=0.1,
        transform=np.array([[1.0, 1.0], [0.0, 1.0], [0.0, 1.0]]),
        mean=np.array([0.0, 1.0, 0.0]),
    )


def test_trainer_runs_and_improves(capsys):
    real = ground_truth()
    data = real.sample(500, 0.2)
    seen = []
    trainer = PPCATrainer(data)
    model = trainer.train(
        state_size=2, n_iters=12, quiet=True,
        callback=lambda i, m: seen.append(m),
    )
    assert len(seen) == 12
    llks = [m.llk for m in seen]
    assert llks[-1] > llks[0]
    # llk is monotone under plain EM
    assert all(b >= a - 1e-7 for a, b in zip(llks, llks[1:]))
    # result is canonical: orthogonal columns
    gram = model.transform.T @ model.transform
    np.testing.assert_allclose(gram, np.diag(np.diag(gram)), atol=1e-6)
    # quiet → nothing printed
    assert capsys.readouterr().out == ""


def test_trainer_prints_reference_format(capsys):
    real = ground_truth()
    data = real.sample(50, 0.2)
    PPCATrainer(data).train(state_size=2, n_iters=2)
    out = capsys.readouterr().out
    assert "Masked PPCA iteration 1: aic=" in out


def test_trainer_warm_start_and_prior():
    real = ground_truth()
    data = real.sample(100, 0.2)
    prior = Prior().with_isotropic_noise_prior(100.0, 100.0)
    m0 = PPCATrainer(data).train(state_size=2, n_iters=2, quiet=True)
    m1 = PPCATrainer(data).train(start=m0, prior=prior, state_size=2, n_iters=3, quiet=True)
    assert np.isfinite(m1.llk(data))


def test_trainer_checkpointing(tmp_path):
    real = ground_truth()
    data = real.sample(60, 0.2)
    path = str(tmp_path / "ckpt.ppca")
    PPCATrainer(data).train(
        state_size=2, n_iters=5, quiet=True,
        checkpoint_path=path, checkpoint_every=2,
    )
    with open(path, "rb") as fh:
        restored = PPCAModel.load(fh.read())
    assert restored.state_size == 2
    # resumable as a warm start
    m2 = PPCATrainer(data).train(start=restored, state_size=2, n_iters=1, quiet=True)
    assert np.isfinite(m2.llk(data))


def test_metrics_formulas():
    m = TrainMetrics.compute(llk_total=-100.0, n_parameters=10, n_samples=50)
    assert np.isclose(m.llk, -2.0)
    assert np.isclose(m.aic, 2.0 * (10 + 100.0) / 50)
    assert np.isclose(m.bic, (-100.0 - 10 * np.log(50)) / 50)


def test_mix_trainer(capsys):
    real = ground_truth()
    data = real.sample(200, 0.1)
    model = PPCAMixTrainer(data).train(n_models=2, state_size=2, n_iters=4, quiet=True)
    assert len(model.models) == 2
    assert np.isfinite(model.llk(data))
    PPCAMixTrainer(data).train(n_models=1, state_size=1, n_iters=1)
    assert "Masked PPCA mix iteration 1" in capsys.readouterr().out


def test_quiet_checkpoint_segmented_scan_matches_loop(tmp_path):
    """quiet+checkpoint training (segmented iterate_n scans) == verbose
    training (the per-iteration loop) with the same checkpoint cadence."""
    real = ground_truth()
    data = real.sample(80, 0.3)
    pa, pb = str(tmp_path / "a.ppca"), str(tmp_path / "b.ppca")
    import jax
    a = PPCATrainer(data).train(state_size=2, n_iters=5, quiet=True,
                                checkpoint_path=pa, checkpoint_every=2,
                                key=jax.random.PRNGKey(40))
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        b = PPCATrainer(data).train(state_size=2, n_iters=5, quiet=False,
                                    checkpoint_path=pb, checkpoint_every=2,
                                    key=jax.random.PRNGKey(40))
    np.testing.assert_allclose(a.transform, b.transform, rtol=1e-9, atol=1e-12)
    ra = PPCAModel.load(open(pa, "rb").read())
    rb = PPCAModel.load(open(pb, "rb").read())
    np.testing.assert_allclose(ra.transform, rb.transform, rtol=1e-9, atol=1e-12)

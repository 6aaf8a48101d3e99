"""Mixture models: cluster while reducing dimension, pick M by BIC.

Covers the reference capability of `examples/ppca_mixture.py` (training
PPCAMix across several component counts and running the mixture verbs), but
as a model-selection story: data come from three well-separated low-rank
clusters and BIC should prefer M=3. On TPU the fused mixture EM computes all
components' responsibilities and statistics in ONE pass over the data per
iteration, so cost grows mildly with M.
"""

import jax
import numpy as np

from ppca_rs_tpu import Dataset, PPCAMixTrainer

rng = np.random.default_rng(3)
D, K = 6, 2
centers = np.array(
    [
        [5.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 5.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 5.0, 0.0],
    ]
)

rows, labels = [], []
for c, center in enumerate(centers):
    loading = rng.normal(size=(D, K))
    z = rng.normal(size=(120, K))
    rows.append(z @ loading.T + center + 0.3 * rng.normal(size=(120, D)))
    labels.extend([c] * 120)
data = np.concatenate(rows)
labels = np.array(labels)

# Hide 15% of the entries; the mixture handles missing data natively.
data[rng.random(data.shape) < 0.15] = np.nan
dataset = Dataset(data)

fits = {}
for m in (1, 2, 3, 4):
    print(f"--- fitting M={m} ---")
    mix = PPCAMixTrainer(dataset).train(
        n_models=m, state_size=K, n_iters=40, metric="bic",
        key=jax.random.PRNGKey(m), quiet=True,
    )
    bic = float(mix.llk(dataset)) - mix.n_parameters * np.log(len(dataset))
    fits[m] = (mix, bic)
    print(f"M={m}: llk/sample={float(mix.llk(dataset)) / len(dataset):.3f} "
          f"bic={bic / len(dataset):.3f}")

best_m = max(fits, key=lambda m: fits[m][1])
print(f"BIC selects M={best_m}")
assert best_m == 3, f"BIC should recover the 3 generating clusters, got {best_m}"

# The responsibilities should reproduce the generating partition almost
# perfectly (clusters are far apart).
best = fits[3][0]
resp = best.infer_cluster(dataset)
hard = np.argmax(resp, axis=1)
# map each predicted cluster to its majority true label
agree = 0
for c in range(3):
    if (hard == c).any():
        majority = np.bincount(labels[hard == c]).argmax()
        agree += int(((hard == c) & (labels == majority)).sum())
purity = agree / len(labels)
print(f"cluster purity: {purity:.3f}")
assert purity > 0.95

# The mixture verbs work batch-wide: denoise, fill the gaps, sample.
smoothed = best.smooth(dataset)
extrapolated = best.extrapolate(dataset)
assert np.isfinite(extrapolated.numpy()).all(), "extrapolate fills every NaN"
draw = best.infer(dataset).posterior_sampler().sample(key=jax.random.PRNGKey(0))
assert draw.numpy().shape == data.shape
print("ok: mixture clusters recovered and verbs ran end-to-end")

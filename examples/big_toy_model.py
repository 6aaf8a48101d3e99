"""Scale smoke test: D=200, k=16, 100k samples, 24 EM iterations.

Capability port of the reference's `examples/big_toy_model.py` — the
de-facto perf workload (`ppca/src/lib.rs:65-99`).
"""

import time

import numpy as np

from ppca_rs_tpu import PPCAModel

print("Generating model")
transform = np.random.binomial(1, 0.1, size=(200, 16)).astype("float64")
real_model = PPCAModel(transform=transform, isotropic_noise=0.1, mean=np.zeros(200))

print("Generating synthetic sample")
sample = real_model.sample(100_000, 0.2)

print("Initializing model")
model = PPCAModel.init(16, sample)

print("Starting iterations...")
start = time.perf_counter()
for it in range(24):
    print(f"At iteration {it + 1} PPCA llk is {model.llk(sample) / len(sample)}")
    model = model.iterate(sample)

print(f"Model trained in {time.perf_counter() - start:.2f}s")

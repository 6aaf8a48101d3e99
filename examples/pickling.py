"""Pickle round-trip of a model.

Capability port of the reference's `examples/pickling.py`.
"""

import pickle

import numpy as np

from ppca_rs_tpu import PPCAModel

model = PPCAModel(
    transform=np.array([[1, 1, 0], [1, 0, 1]], dtype="float64").T,
    isotropic_noise=0.1,
    mean=np.array([0, 1, 0], dtype="float64"),
)

ser = pickle.dumps(model)
de = pickle.loads(ser)

print(model)
print(de)

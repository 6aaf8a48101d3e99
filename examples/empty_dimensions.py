"""Weighted dataset with an all-NaN column.

Capability port of the reference's `examples/empty_dimensions.py`.
"""

import numpy as np

from ppca_rs_tpu import Dataset

dataset = Dataset(
    np.array([[1.0, 1.0, np.nan], [1.0, 1.0, np.nan]], dtype="float64"),
    weights=np.array([1.0, 2.0]),
)

print(dataset.empty_dimensions())

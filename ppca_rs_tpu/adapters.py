"""Long-format DataFrame <-> Dataset adapters.

Capability twin of the reference's pure-Python adapters
(`python/ppca_rs/__init__.py:121-433`): a long-format frame with key columns,
dimension columns and one metric column becomes a dense NaN-initialized
``(n_samples, n_dims)`` array (then a :class:`Dataset`), with reproducible
dimension/sample index tables and the inverse conversion back to a long
frame.  pandas and polars are both supported via duck-typed lazy imports.

Implementation differs from the reference (which populates the dense array in
a per-group Python loop): we factorize keys/dimensions to integer codes and
scatter all values at once — through the multithreaded C++ packer when
available (`native/packing.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Literal, Optional

import numpy as np

from .dataset import Dataset
from .native import packing as _packing


def _dims_from_index(dimension_idx, dimensions: Optional[List[str]], columns) -> List[str]:
    if dimensions is not None:
        return dimensions
    return [c for c in columns if c != "__dim_idx"]


@dataclass
class DataFrameAdapter:
    """Maps a long-format DataFrame into a Dataset
    (`python/ppca_rs/__init__.py:121-354`)."""

    keys: List[str]
    dimensions: List[str]
    metric: str
    dimension_idx: Any    # frame with dimension columns + "__dim_idx"
    sample_idx: Any       # frame with key columns + "__sample_idx"
    dataset: Dataset
    origin: Literal["pandas", "polars"]

    # ------------------------------------------------------------------ #

    @classmethod
    def from_pandas(
        cls,
        df,
        *,
        keys: List[str],
        dimensions: Optional[List[str]] = None,
        dimension_idx=None,
        metric: str,
    ) -> "DataFrameAdapter":
        import pandas as pd

        if dimension_idx is None:
            if dimensions is None:
                raise ValueError("either dimensions or dimension_idx must be given")
            dimension_idx = (
                df[dimensions]
                .drop_duplicates()
                .sort_values(dimensions)
                .reset_index(drop=True)
            )
            dimension_idx.index.name = "__dim_idx"
            dimension_idx = dimension_idx.reset_index()
        else:
            dimensions = _dims_from_index(dimension_idx, dimensions, dimension_idx.columns)

        merged = df.merge(dimension_idx, on=dimensions)

        # Factorize the key tuple to sample codes, in first-appearance order
        # of the sorted groupby (to match the reference's groupby(keys)
        # iteration order we sort by keys).
        key_frame = merged[keys]
        codes, uniques = pd.factorize(pd.MultiIndex.from_frame(key_frame), sort=True)
        n_samples = len(uniques)
        n_dims = len(dimension_idx)

        dense = _packing.scatter_long_to_dense(
            codes.astype(np.int64),
            merged["__dim_idx"].to_numpy(dtype=np.int64),
            merged[metric].to_numpy(dtype=np.float64),
            n_samples,
            n_dims,
        )

        sample_idx = pd.DataFrame(uniques.to_frame(index=False))
        sample_idx.columns = list(keys)
        sample_idx["__sample_idx"] = np.arange(n_samples, dtype=np.uint32)

        return cls(
            keys=list(keys),
            dimensions=list(dimensions),
            metric=metric,
            dimension_idx=dimension_idx,
            sample_idx=sample_idx,
            dataset=Dataset(dense),
            origin="pandas",
        )

    @classmethod
    def from_polars(
        cls,
        df,
        *,
        keys: List[str],
        dimensions: Optional[List[str]] = None,
        dimension_idx=None,
        metric: str,
    ) -> "DataFrameAdapter":
        import polars as pl

        if dimension_idx is None:
            if dimensions is None:
                raise ValueError("either dimensions or dimension_idx must be given")
            dimension_idx = (
                df.lazy()
                .select(dimensions)
                .unique(maintain_order=False)
                .sort(dimensions)
                .with_row_index("__dim_idx")
                .collect()
            )
        else:
            dimensions = _dims_from_index(dimension_idx, dimensions, dimension_idx.columns)

        merged = df.lazy().join(dimension_idx.lazy(), on=dimensions).collect()

        sample_idx = (
            merged.lazy()
            .select(keys)
            .unique(maintain_order=False)
            .sort(keys)
            .with_row_index("__sample_idx")
            .collect()
        )
        merged = merged.join(sample_idx, on=keys)

        n_samples = len(sample_idx)
        n_dims = len(dimension_idx)
        dense = _packing.scatter_long_to_dense(
            merged["__sample_idx"].to_numpy().astype(np.int64),
            merged["__dim_idx"].to_numpy().astype(np.int64),
            merged[metric].to_numpy().astype(np.float64),
            n_samples,
            n_dims,
        )

        return cls(
            keys=list(keys),
            dimensions=list(dimensions),
            metric=metric,
            dimension_idx=dimension_idx,
            sample_idx=sample_idx.select([*keys, "__sample_idx"]),
            dataset=Dataset(dense),
            origin="polars",
        )

    # ------------------------------------------------------------------ #

    def description(self) -> "DataFrameAdapterDescription":
        """Serializable spec of this adapter
        (`python/ppca_rs/__init__.py:272-296`)."""
        if self.origin == "pandas":
            ordered = self.dimension_idx.sort_values("__dim_idx")
            # columnar extraction (no per-row iterrows): one ndarray per
            # column, zipped — mixed dtypes stay exact (object columns keep
            # their Python values; tolist() would not change that either).
            cols = [ordered[c].to_numpy().tolist() for c in self.dimensions]
            dim_rows = [list(t) for t in zip(*cols)]
        elif self.origin == "polars":
            ordered = self.dimension_idx.sort("__dim_idx")
            cols = [list(ordered[c]) for c in self.dimensions]
            dim_rows = [list(t) for t in zip(*cols)]
        else:
            raise ValueError(f"Unknown origin {self.origin}")
        return DataFrameAdapterDescription(
            keys=list(self.keys),
            dimensions=list(self.dimensions),
            metric=self.metric,
            dimension_idx=dim_rows,
        )

    def convert_dataset(self, dataset: Dataset, *, column_name: str):
        return self.convert_datasets({column_name: dataset})

    def convert_datasets(self, datasets: Dict[str, Dataset]):
        """Back to a long frame: one row per (sample, dimension) pair with one
        value column per input dataset (`python/ppca_rs/__init__.py:301-354`)."""
        data = {name: ds.numpy().reshape(-1) for name, ds in datasets.items()}
        n_samples = len(self.sample_idx)
        n_dims = len(self.dimension_idx)
        sample_col = np.repeat(np.arange(n_samples, dtype="uint32"), n_dims)
        dim_col = np.tile(np.arange(n_dims, dtype="uint32"), n_samples)

        if self.origin == "pandas":
            import pandas as pd

            frame = pd.DataFrame({**data, "__sample_idx": sample_col, "__dim_idx": dim_col})
            return (
                frame.merge(self.dimension_idx, on="__dim_idx")
                .merge(self.sample_idx, on="__sample_idx")
                [[*self.keys, *self.dimensions, *datasets.keys()]]
            )
        elif self.origin == "polars":
            import polars as pl

            frame = pl.DataFrame({**data, "__sample_idx": sample_col, "__dim_idx": dim_col})
            return (
                frame.join(self.dimension_idx, on="__dim_idx")
                .join(self.sample_idx, on="__sample_idx")
                .select([*self.keys, *self.dimensions, *data.keys()])
            )
        else:
            raise ValueError(f"Unknown origin {self.origin}")


@dataclass
class DataFrameAdapterDescription:
    """Data-free, JSON-serializable adapter spec that can re-adapt new frames
    with a stored dimension indexing
    (`python/ppca_rs/__init__.py:357-433`)."""

    keys: List[str]
    dimensions: List[str]
    metric: str
    dimension_idx: List[List]

    @property
    def dimension_idx_pandas(self) -> Any:
        import pandas as pd

        cols = {
            "__dim_idx": np.arange(len(self.dimension_idx), dtype="uint32"),
        }
        for i, dim in enumerate(self.dimensions):
            cols[dim] = [row[i] for row in self.dimension_idx]
        return pd.DataFrame(cols)

    @property
    def dimension_idx_polars(self) -> Any:
        import polars as pl

        cols = {
            "__dim_idx": np.arange(len(self.dimension_idx), dtype="uint32"),
        }
        for i, dim in enumerate(self.dimensions):
            cols[dim] = [row[i] for row in self.dimension_idx]
        return pl.DataFrame(cols)

    @classmethod
    def from_json(cls, value: dict) -> "DataFrameAdapterDescription":
        return cls(**value)

    def to_json(self) -> dict:
        return {
            "keys": self.keys,
            "dimensions": self.dimensions,
            "metric": self.metric,
            "dimension_idx": self.dimension_idx,
        }

    def adapt_pandas(self, df) -> DataFrameAdapter:
        return DataFrameAdapter.from_pandas(
            df,
            keys=self.keys,
            dimension_idx=self.dimension_idx_pandas,
            metric=self.metric,
        )

    def adapt_polars(self, df) -> DataFrameAdapter:
        return DataFrameAdapter.from_polars(
            df,
            keys=self.keys,
            dimension_idx=self.dimension_idx_polars,
            metric=self.metric,
        )

"""A minimal polars-shaped shim backed by pandas.

polars is not installed in this environment; this shim implements exactly the
surface `ppca_rs_tpu.adapters` uses (DataFrame/lazy/select/unique/sort/
with_row_index/join/collect/column access) so the from_polars code path is
executed by CI.  It is NOT a general polars replacement — tests register it
as ``sys.modules["polars"]`` explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class Series:
    def __init__(self, values):
        self._values = np.asarray(values)

    def to_numpy(self):
        return self._values

    def __getitem__(self, i):
        return self._values[i]

    def __len__(self):
        return len(self._values)


class DataFrame:
    def __init__(self, data):
        if isinstance(data, pd.DataFrame):
            self._df = data.reset_index(drop=True)
        else:
            self._df = pd.DataFrame(data)

    # -- container surface ------------------------------------------------
    @property
    def columns(self):
        return list(self._df.columns)

    def __len__(self):
        return len(self._df)

    def __getitem__(self, col):
        return Series(self._df[col].to_numpy())

    def to_pandas(self):
        return self._df.copy()

    # -- verbs used by the adapter ----------------------------------------
    def lazy(self):
        return LazyFrame(self._df)

    def sort(self, by):
        return DataFrame(self._df.sort_values(by))

    def select(self, cols):
        return DataFrame(self._df[list(cols)])

    def join(self, other, on):
        other_df = other._df if isinstance(other, DataFrame) else other.collect()._df
        return DataFrame(self._df.merge(other_df, on=on))

    def with_row_index(self, name):
        out = self._df.reset_index(drop=True).copy()
        out.insert(0, name, np.arange(len(out), dtype=np.uint32))
        return DataFrame(out)


class LazyFrame:
    """Eager stand-in: each verb applies immediately; collect() unwraps."""

    def __init__(self, df: pd.DataFrame):
        self._df = df.reset_index(drop=True)

    def select(self, cols):
        return LazyFrame(self._df[list(cols)])

    def unique(self, maintain_order=False):
        return LazyFrame(self._df.drop_duplicates())

    def sort(self, by):
        return LazyFrame(self._df.sort_values(by))

    def with_row_index(self, name):
        out = self._df.reset_index(drop=True).copy()
        out.insert(0, name, np.arange(len(out), dtype=np.uint32))
        return LazyFrame(out)

    def join(self, other, on):
        other_df = other._df if isinstance(other, (LazyFrame, DataFrame)) else other
        return LazyFrame(self._df.merge(other_df, on=on))

    def lazy(self):
        return self

    def collect(self):
        return DataFrame(self._df)

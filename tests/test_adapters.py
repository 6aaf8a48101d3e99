"""DataFrameAdapter tests (capability parity with
`python/ppca_rs/__init__.py:121-433`).  polars tests run only when polars is
installed (it is ducktyped/optional, like the reference)."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from ppca_rs_tpu import DataFrameAdapter, DataFrameAdapterDescription, Dataset, PPCATrainer


def long_frame():
    rows = []
    for user in ["a", "b", "c"]:
        for city, month in [("nyc", 1), ("nyc", 2), ("par", 1), ("par", 2)]:
            if user == "b" and city == "par":
                continue  # missing entries for user b
            rows.append(
                {
                    "user": user,
                    "city": city,
                    "month": month,
                    "price": {"a": 1.0, "b": 2.0, "c": 3.0}[user] + month * 0.1,
                }
            )
    return pd.DataFrame(rows)


def test_from_pandas_roundtrip():
    df = long_frame()
    adapter = DataFrameAdapter.from_pandas(
        df, keys=["user"], dimensions=["city", "month"], metric="price"
    )
    ds = adapter.dataset
    assert len(ds) == 3
    assert ds.output_size() == 4
    arr = ds.numpy()
    # dimension order is sorted (city, month): (nyc,1),(nyc,2),(par,1),(par,2)
    np.testing.assert_allclose(arr[0], [1.1, 1.2, 1.1, 1.2])
    assert np.isnan(arr[1, 2]) and np.isnan(arr[1, 3])  # user b, par missing
    np.testing.assert_allclose(arr[1, :2], [2.1, 2.2])
    np.testing.assert_allclose(arr[2], [3.1, 3.2, 3.1, 3.2])


def test_convert_dataset_back():
    df = long_frame()
    adapter = DataFrameAdapter.from_pandas(
        df, keys=["user"], dimensions=["city", "month"], metric="price"
    )
    out = adapter.convert_dataset(adapter.dataset, column_name="price")
    assert set(out.columns) == {"user", "city", "month", "price"}
    assert len(out) == 12  # 3 users x 4 dims, NaN rows included
    merged = out.merge(df, on=["user", "city", "month"], suffixes=("_out", "_in"))
    np.testing.assert_allclose(merged["price_out"], merged["price_in"])


def test_description_and_readapt():
    df = long_frame()
    adapter = DataFrameAdapter.from_pandas(
        df, keys=["user"], dimensions=["city", "month"], metric="price"
    )
    desc = adapter.description()
    js = desc.to_json()
    desc2 = DataFrameAdapterDescription.from_json(js)
    assert desc2.dimensions == ["city", "month"]
    assert len(desc2.dimension_idx) == 4

    # re-adapting new data with the stored indexing keeps dimension order
    adapter2 = desc2.adapt_pandas(df)
    np.testing.assert_allclose(adapter2.dataset.numpy(), adapter.dataset.numpy())


def test_train_through_adapter():
    df = long_frame()
    adapter = DataFrameAdapter.from_pandas(
        df, keys=["user"], dimensions=["city", "month"], metric="price"
    )
    model = PPCATrainer(adapter.dataset).train(state_size=1, n_iters=3, quiet=True)
    sm = model.extrapolate(adapter.dataset)
    out = adapter.convert_dataset(sm, column_name="price_filled")
    assert not out["price_filled"].isna().any()


def _polars_or_shim():
    """Real polars when installed, else the pandas-backed shim implementing
    exactly the surface adapters.py touches (tests/fake_polars.py) — so the
    from_polars code path always executes in CI."""
    import sys

    try:
        import polars as pl  # pragma: no cover - not installed here
        return pl, False
    except ImportError:
        import fake_polars

        sys.modules["polars"] = fake_polars
        return fake_polars, True


def test_polars_roundtrip():
    import sys

    pl, shimmed = _polars_or_shim()
    try:
        df = pl.DataFrame(long_frame()) if shimmed else pl.from_pandas(long_frame())
        adapter = DataFrameAdapter.from_polars(
            df, keys=["user"], dimensions=["city", "month"], metric="price"
        )
        assert adapter.origin == "polars"
        assert len(adapter.dataset) == 3
        assert adapter.dataset.output_size() == 4

        # numbers must match the pandas adapter exactly
        ref = DataFrameAdapter.from_pandas(
            long_frame(), keys=["user"], dimensions=["city", "month"], metric="price"
        )
        np.testing.assert_allclose(
            adapter.dataset.numpy(), ref.dataset.numpy(), equal_nan=True
        )

        out = adapter.convert_dataset(adapter.dataset, column_name="price")
        assert len(out) == 12

        # description round trip re-adapts through the polars path
        desc = DataFrameAdapterDescription.from_json(adapter.description().to_json())
        adapter2 = desc.adapt_polars(df)
        np.testing.assert_allclose(
            adapter2.dataset.numpy(), adapter.dataset.numpy(), equal_nan=True
        )
    finally:
        if shimmed:
            sys.modules.pop("polars", None)

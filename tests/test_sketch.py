"""HyperLogLog cardinality sketch: accuracy, mergeability, dataset op."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from simplecrawler_ray.functions.sketch import (
    approx_ndistinct, hll_estimate, hll_merge, hll_partial)


def test_hll_accuracy_large():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 1 << 62, 200_000)
    n_exact = len(np.unique(vals))
    est = hll_estimate(hll_partial(pd.Series(vals)))
    assert abs(est - n_exact) / n_exact < 0.02


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 10_000, 50_000)
    whole = hll_partial(pd.Series(vals))
    parts = [hll_partial(pd.Series(c)) for c in np.array_split(vals, 7)]
    assert np.array_equal(hll_merge(parts), whole)


def test_hll_small_range_linear_counting():
    est = hll_estimate(hll_partial(pd.Series(np.arange(100))))
    assert abs(est - 100) / 100 < 0.05


def test_approx_ndistinct_dataset(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"u": rng.integers(0, 5_000, 100_000)})
    n_exact = df["u"].nunique()
    est = approx_ndistinct(rd.from_pandas(df).repartition(16), "u")
    assert abs(est - n_exact) / n_exact < 0.02

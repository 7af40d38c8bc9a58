"""HLL sketch accuracy + mergeability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_ray.functions.sketch import HLL, _hash64, approx_distinct


def test_hll_accuracy_within_bound():
    hll = HLL(p=12)
    for true_n in (100, 5000, 50000):
        vals = np.arange(true_n)
        est = hll.estimate(hll.registers(_hash64(vals)))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    hll = HLL(p=12)
    vals = np.arange(30000)
    whole = hll.registers(_hash64(vals))
    merged = np.maximum(
        hll.registers(_hash64(vals[:17000])),
        hll.registers(_hash64(vals[12000:])),  # overlapping halves
    )
    assert np.array_equal(whole, merged)


def test_approx_distinct_vs_exact():
    n = 10000
    df = pd.DataFrame(
        {
            "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
            "v": np.arange(n) % 900,
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    approx = approx_distinct(ds, group="g", value="v")
    exact = df.groupby("g")["v"].nunique()
    for _, row in approx.iterrows():
        true_n = exact[row["g"]]
        assert abs(row["approx_n"] - true_n) / true_n < 0.05

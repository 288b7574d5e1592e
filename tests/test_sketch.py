"""HyperLogLog sketch (stages/sketch.py): determinism, accuracy,
merge semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.sketch import (
    HLL_M,
    _batch_registers,
    _estimate,
    hll_distinct,
)


class TestHll:
    def test_register_rank_spec(self):
        # a value whose hash window is 0 gets the max rank 53
        reg = _batch_registers([], m=HLL_M)
        assert reg.sum() == 0

    def test_estimate_accuracy(self):
        values = [f"value-{i}" for i in range(20_000)]
        reg = _batch_registers(values)
        _, est = _estimate(reg)
        # 4096 registers -> ~1.6% standard error; allow 5%
        assert abs(est - 20_000) / 20_000 < 0.05

    def test_small_range_correction(self):
        values = [f"v{i}" for i in range(100)]
        nz, est = _estimate(_batch_registers(values))
        assert nz <= 100
        assert abs(est - 100) / 100 < 0.15

    def test_duplicates_do_not_inflate(self):
        once = _batch_registers([f"v{i}" for i in range(500)])
        thrice = _batch_registers([f"v{i}" for i in range(500)] * 3)
        assert np.array_equal(once, thrice)

    def test_merge_is_max(self):
        a = _batch_registers([f"a{i}" for i in range(300)])
        b = _batch_registers([f"b{i}" for i in range(300)])
        both = _batch_registers(
            [f"a{i}" for i in range(300)] + [f"b{i}" for i in range(300)]
        )
        assert np.array_equal(np.maximum(a, b), both)

    def test_distributed_layout_invariant(self, ray_session):
        rows = pd.DataFrame({"text": [f"doc {i} text" for i in range(2000)]})
        a = hll_distinct(rd.from_pandas(rows).repartition(1), "text")
        b = hll_distinct(rd.from_pandas(rows.iloc[::-1]).repartition(13), "text")
        pd.testing.assert_frame_equal(a, b)
        assert abs(a["n_distinct_est"].iloc[0] - 2000) / 2000 < 0.05

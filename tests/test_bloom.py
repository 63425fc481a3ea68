"""Bloom semi-/anti-join (stages/bloom.py): exactness is the contract
— the Bloom pass only prunes, the second pass restores exact
semantics. A deliberately tiny bitmap (64 bits → FPR near 1) stresses
the false-positive recovery path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hikma_engine_ray.stages.bloom import anti_join, build_bloom, bloom_mask_fn, semi_join


def _tables():
    rng = np.random.RandomState(7)
    left = pa.table({
        "k": pa.array(rng.randint(0, 200, size=500), pa.int64()),
        "payload": pa.array(np.arange(500), pa.int64()),
    })
    right = pa.table({
        # duplicates on the right must not duplicate left rows (semi)
        "k": pa.array(np.repeat(rng.choice(200, size=60, replace=False), 3), pa.int64()),
    })
    return left, right


def _expected(left: pa.Table, right: pa.Table, anti: bool):
    l = left.to_pandas()
    rk = set(right["k"].to_pylist())
    mask = l["k"].isin(rk)
    out = l[~mask] if anti else l[mask]
    return set(map(tuple, out[["k", "payload"]].itertuples(index=False)))


@pytest.mark.parametrize("num_bits", [64, 1 << 14])
def test_semi_join_exact(ray_session, num_bits):
    import ray.data as rd

    left, right = _tables()
    got = semi_join(rd.from_arrow(left), rd.from_arrow(right), on=["k"],
                    num_bits=num_bits, nbuckets=4).take_all()
    assert {(r["k"], r["payload"]) for r in got} == _expected(left, right, anti=False)


@pytest.mark.parametrize("num_bits", [64, 1 << 14])
def test_anti_join_exact(ray_session, num_bits):
    import ray.data as rd

    left, right = _tables()
    got = anti_join(rd.from_arrow(left), rd.from_arrow(right), on=["k"],
                    num_bits=num_bits, nbuckets=4).take_all()
    assert {(r["k"], r["payload"]) for r in got} == _expected(left, right, anti=True)


def test_bloom_no_false_negatives(ray_session):
    """Every true member passes the Bloom test (the filter may only
    over-approximate, never drop a member)."""
    import ray

    import ray.data as rd

    left, right = _tables()
    ref = build_bloom(rd.from_arrow(right), on=["k"], num_bits=1 << 10, k=5)
    kept = bloom_mask_fn(ref, ["k"], 1 << 10, 5, keep_hits=True)(left)
    member_keys = set(right["k"].to_pylist())
    kept_keys = set(kept["k"].to_pylist())
    assert member_keys & set(left["k"].to_pylist()) <= kept_keys


def test_bloom_tree_merge_spans_blocks(ray_session):
    """Keys scattered across many input blocks all land in the merged
    bitmap (the tree-OR reduce really merges every partial)."""
    import ray
    import ray.data as rd

    right = rd.from_pandas(pd.DataFrame({"k": np.arange(1000)})).repartition(40)
    ref = build_bloom(right, on=["k"], num_bits=1 << 14, k=5, fanin=4)
    probe = pa.table({"k": pa.array(np.arange(1000), pa.int64())})
    kept = bloom_mask_fn(ref, ["k"], 1 << 14, 5, keep_hits=True)(probe)
    assert kept.num_rows == 1000

"""Connected components: distributed star contraction ≡ union-find."""

import numpy as np
import pyarrow as pa

from hikma_engine_ray.stages.components import (
    PAIR_SCHEMA,
    connected_components,
    dedup_clusters,
    union_find_components,
)


def _pairs_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pydict(
        {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]},
        schema=PAIR_SCHEMA,
    ))


def _as_map(ds):
    return {r["node"]: r["root"] for r in ds.take_all()}


def test_union_find_basic():
    comp = union_find_components([(1, 2), (2, 3), (10, 11), (5, 5)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[5] == 5


def test_distributed_matches_union_find_random(ray_session):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 60
        m = 50 + trial * 30
        pairs = [tuple(sorted(p)) for p in rng.randint(0, n, size=(m, 2))
                 if p[0] != p[1]]
        want = union_find_components(pairs)
        want_map = {k: v for k, v in want.items() if k != v}
        got = _as_map(connected_components(_pairs_ds(pairs)))
        assert got == want_map, trial


def test_distributed_chain_worst_diameter(ray_session):
    # a 40-node path: diameter stresses the iteration count
    pairs = [(i, i + 1) for i in range(40)]
    got = _as_map(connected_components(_pairs_ds(pairs)))
    assert got == {i: 0 for i in range(1, 41)}


def test_dedup_clusters_both_paths_agree(ray_session):
    pairs = [(3, 1), (1, 2), (9, 8), (20, 21), (21, 22), (22, 20)]
    ds = _pairs_ds(pairs)
    local = _as_map(dedup_clusters(ds))
    dist = _as_map(dedup_clusters(ds, distributed=True))
    assert local == dist
    assert local[2] == local[3] == 1 and local[9] == 8
    assert local[21] == local[22] == 20


def test_empty_pairs(ray_session):
    assert _as_map(dedup_clusters(_pairs_ds([]))) == {}
    assert connected_components(_pairs_ds([])).count() == 0

"""Round-5 operator tests: bucketed embedding decontaminate route,
IVF artifact cache keys, pinned-bucket BFS large route, auto bucket
derivation, hashed scale-mode sampling twins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("vec_id").reset_index(drop=True)


def test_embedding_decontaminate_full_probe_equals_exact(ray_session):
    """Forced bucketed route with nprobe == n_lists reproduces the
    exact broadcast route bit-for-bit (every test row meets every
    train row exactly once across the lists)."""
    from rdfx_ray.functions.similarity import embedding_decontaminate

    exact = _sorted(embedding_decontaminate(SF).to_pandas())
    full = _sorted(embedding_decontaminate(
        SF, broadcast_cutoff=0, n_lists=8, nprobe=8).to_pandas())
    assert len(exact) == len(full) > 0
    m = exact.merge(full, on="vec_id", suffixes=("_e", "_b"))
    assert len(m) == len(exact)
    assert (m["max_sim_1e6_e"] == m["max_sim_1e6_b"]).all()


def test_embedding_decontaminate_partial_probe_bounds(ray_session):
    """Default nprobe is a documented-recall approximation: same
    test-row set, per-row max-sim never above the exact answer, and
    (deterministic corpus) most rows find their true max."""
    from rdfx_ray.functions.similarity import embedding_decontaminate

    exact = _sorted(embedding_decontaminate(SF).to_pandas())
    approx = _sorted(embedding_decontaminate(
        SF, broadcast_cutoff=0, n_lists=16, nprobe=4).to_pandas())
    m = exact.merge(approx, on="vec_id", suffixes=("_e", "_a"))
    assert len(m) == len(exact) == len(approx)
    assert (m["max_sim_1e6_a"] <= m["max_sim_1e6_e"]).all()
    # deterministic at this corpus: measured 0.636 exact-hit fraction
    assert (m["max_sim_1e6_a"] == m["max_sim_1e6_e"]).mean() >= 0.5


def test_ivf_cache_key_encodes_training_route(ray_session):
    """Sampled and distributed Lloyd's training produce different
    centroids — the artifact key must keep their caches apart so a
    flipped default never serves the other route's index."""
    from rdfx_ray.functions.similarity import ivf_index_for

    a = ivf_index_for(SF, n_lists=4)
    b = ivf_index_for(SF, n_lists=4, distributed_train=True)
    assert a.index_dir != b.index_dir
    assert str(b.index_dir).endswith("-D1")
    # cache round-trip: same flag → same artifact dir, loaded not
    # rebuilt (manifest already present)
    a2 = ivf_index_for(SF, n_lists=4)
    b2 = ivf_index_for(SF, n_lists=4, distributed_train=True)
    assert a2.index_dir == a.index_dir
    assert b2.index_dir == b.index_dir
    assert np.array_equal(b2.centroids, b.centroids)

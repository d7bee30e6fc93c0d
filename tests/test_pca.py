"""Distributed PCA (operators/similarity.py: gram_partials / pca_components
/ pca_project): exactness of the integer covariance against numpy, axis
orthonormality, explained-variance ordering, and projection parity with a
pure-numpy PCA over the collected corpus. The DuckDB value-parity of
embedding_covariance_topk is covered by test_correctness.py."""

from __future__ import annotations

import numpy as np
import pytest

from impalatogo_spark.operators import similarity as S
from impalatogo_spark.session import table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_covariance_matches_numpy_exactly(emb, X):
    Q = np.floor(X * float(S.PCA_QUANT)).astype(np.int64)
    G = Q.T @ Q
    got = {(r["i"], r["j"]): r["cov_q"]
           for r in S.covariance_matrix(emb).collect()}
    iu = np.triu_indices(X.shape[1])
    assert len(got) == len(iu[0])
    for i, j in zip(*iu):
        assert got[(i, j)] == int(G[i, j]), (i, j)


def test_pca_axes_orthonormal_and_variance_ordered(emb):
    comps, vals = S.pca_components(emb)
    eye = comps @ comps.T
    assert np.allclose(eye, np.eye(comps.shape[0]), atol=1e-9)
    assert all(vals[k] >= vals[k + 1] for k in range(len(vals) - 1))
    assert vals[-1] >= 0  # second-moment matrix is PSD


def test_projection_matches_numpy(emb, X):
    comps, _ = S.pca_components(emb)
    want = X @ comps.T
    got = S.pca_project(emb).orderBy("vec_id").collect()
    assert len(got) == X.shape[0]
    for r, w in zip(got, want):
        for c in range(comps.shape[0]):
            assert abs(r[f"pc{c}"] - w[c]) < 1e-4, (r["vec_id"], c)


def test_projection_deterministic(emb):
    a = [tuple(r) for r in S.pca_project(emb).orderBy("vec_id").collect()]
    b = [tuple(r) for r in S.pca_project(emb).orderBy("vec_id").collect()]
    assert a == b

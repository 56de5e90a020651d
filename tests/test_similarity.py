"""IVF ANN: trained (sampled k-means) codebook must beat the fixed LCG
codebook on clustered data — the property that justifies ``ivf_train``
(reference-grade ANN trains data-dependent centroids; the LCG codebook
stays as the SQL-oracle mode)."""

import numpy as np
import pandas as pd
import pytest

from prclz_spark.operators import similarity


def _clustered(n_clusters=8, per=50, d=16, noise=0.08, seed=0):
    """Well-separated unit-sphere clusters: the workload IVF exists for."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + noise * rng.normal(
        size=(n_clusters * per, d)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def _recall(result_pdf, truth, k):
    got = result_pdf.groupby("q_id")["neighbor_id"].apply(set)
    hits = sum(len(got.get(q, set()) & truth[q]) for q in truth)
    return hits / (len(truth) * k)


def test_ivf_train_recall_beats_fixed_codebook(spark):
    k, n_centroids, n_probe, d = 10, 8, 2, 16
    pts = _clustered(d=d)
    n = len(pts)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, p)) for p in pts]})
    ).repartition(4)
    q_ids = list(range(0, n, 50))  # one query per cluster
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": q_ids, "embedding": [list(map(float, pts[i])) for i in q_ids]})
    )

    # exact ground truth (cosine == dot on the unit sphere), self excluded
    sims = pts[q_ids] @ pts.T
    truth = {}
    for row, q in enumerate(q_ids):
        order = np.argsort(-sims[row], kind="stable")
        truth[q] = set(int(i) for i in order if i != q)
        truth[q] = set(list(sorted(truth[q], key=lambda i: (-sims[row][i], i)))[:k])

    cb = similarity.ivf_train(emb, n_centroids=n_centroids, sample_size=4096, seed=7)
    assert cb.shape == (n_centroids, d)
    # determinism across invocations (TakeOrdered sample + fixed seed)
    assert np.allclose(cb, similarity.ivf_train(emb, n_centroids=n_centroids,
                                                sample_size=4096, seed=7))

    trained = similarity.ivf_topk(
        emb, queries, k, n_centroids=n_centroids, n_probe=n_probe,
        dim=d, codebook=cb,
    ).toPandas()
    fixed = similarity.ivf_topk(
        emb, queries, k, n_centroids=n_centroids, n_probe=n_probe, dim=d,
    ).toPandas()

    r_trained = _recall(trained, truth, k)
    r_fixed = _recall(fixed, truth, k)
    # k-means centroids land on the true clusters: near-perfect recall at
    # n_probe=2; the LCG codebook partitions arbitrarily and scatters
    # within-cluster neighbors across cells.
    assert r_trained >= 0.9, (r_trained, r_fixed)
    assert r_trained > r_fixed, (r_trained, r_fixed)


def test_ivf_train_tiny_input_pads(spark):
    pts = _clustered(n_clusters=2, per=3, d=8, seed=3)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(pts)),
                      "embedding": [list(map(float, p)) for p in pts]})
    )
    cb = similarity.ivf_train(emb, n_centroids=16, sample_size=64)
    assert cb.shape == (16, 8)
    assert np.isfinite(cb).all()


def test_ivf_train_reseeds_empty_clusters_distinctly(spark):
    """n_centroids >> natural clusters: each iteration's empty clusters
    must reseed to DISTINCT worst-served points — reseeding them all to
    the same argmin collapses the codebook to a few duplicate centroids."""
    pts = _clustered(n_clusters=2, per=60, d=8, noise=0.05, seed=3)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(pts)),
             "embedding": [list(map(float, p)) for p in pts]}
        )
    )
    cb = similarity.ivf_train(emb, n_centroids=16, n_iter=5)
    assert cb.shape == (16, 8)
    n_distinct = len(np.unique(np.round(cb, 9), axis=0))
    assert n_distinct >= 10, f"codebook collapsed to {n_distinct} centroids"

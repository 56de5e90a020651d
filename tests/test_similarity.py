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


def test_pq_trained_beats_fixed_codebooks(spark):
    """PQ quality ladder on the sf0.001 fixture: trained per-subvector
    k-means codebooks must recover real recall@5 against exact
    inner-product top-k, while the fixed LCG codebooks (the SQL-oracle
    mode) quantize data to noise — the measured gap is the reason
    pq_train exists, mirroring ivf_train."""
    import numpy as np

    from prclz_spark import contract as C
    from prclz_spark.operators import similarity as S
    from pyspark.sql import functions as F

    # sf0.01 (2k vectors): sf0.001's ~50-vector corpus is too small for
    # stable recall estimates (trained 0.12 vs fixed 0.06 there; 0.34 vs
    # 0.04 here)
    e = C._t(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    pdf = e.select("vec_id", "embedding").toPandas()
    X = np.stack([np.asarray(v, float) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()

    def recall(top):
        rec = []
        for qi in range(10):
            qv = X[ids == qi][0]
            s = X @ qv
            mask = ids != qi
            exact = set(ids[mask][np.argsort(-s[mask])[:5]])
            rec.append(len(exact & set(top[top.q_id == qi].neighbor_id)) / 5)
        return float(np.mean(rec))

    fixed = recall(S.pq_topk(e, q, k=5, m=8, n_codes=16, dim=64).toPandas())
    books = S.pq_train(e, m=8, n_codes=16, dim=64)
    trained = recall(
        S.pq_topk(e, q, k=5, m=8, n_codes=16, dim=64, codebooks=books).toPandas()
    )
    assert trained >= fixed + 0.15, (trained, fixed)
    assert trained >= 0.25
    # more bits -> more recall: 96-bit codes must beat 32-bit codes
    books2 = S.pq_train(e, m=16, n_codes=64, dim=64)
    trained2 = recall(
        S.pq_topk(e, q, k=5, m=16, n_codes=64, dim=64, codebooks=books2).toPandas()
    )
    assert trained2 >= trained + 0.1, (trained2, trained)


def test_recall_gates_on_fixture(spark):
    """Driver-visible recall gates, pinned: (1) trained 96-bit ADC recall
    ≥ 0.5 vs exact top-5 (the VERDICT operating point); (2) IVF-PQ at the
    192-bit cosine-metric encode loses NOTHING vs IVF-alone at the same
    probe budget (identical candidates, ADC in-cell ranking == exact
    cosine on this fixture); (3) pq_train through Spark reproduces the
    no-Spark numpy helper bit-for-bit, which is what makes the trained
    oracles (SQL-literal codebooks) valid."""
    from prclz_spark import contract

    sf = "/root/testdata/sf0.01"
    ivf = contract.REGISTRY["emb_ivf_recall"][0](spark, sf).toPandas()
    pq = contract.REGISTRY["emb_pq_recall"][0](spark, sf).toPandas()
    ivfpq = contract.REGISTRY["emb_ivfpq_recall"][0](spark, sf).toPandas()
    assert pq.recall_at_5.mean() >= 0.5
    assert ivfpq.recall_at_5.mean() >= ivf.recall_at_5.mean()

    e = contract._t(spark, sf, "embeddings")
    b_spark = similarity.pq_train(e, m=16, n_codes=64, dim=64)
    b_np = contract._pq_trained_books(sf, 16, 64)
    assert np.array_equal(b_spark, b_np)

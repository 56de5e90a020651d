"""dedup module tests: alternating-star connected components vs a
union-find oracle, and phash band-join exactness vs brute force."""

import random

import numpy as np
import pytest

from prclz_spark.operators import dedup


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check_cc(spark, edges, schema):
    nodes = sorted({x for e in edges for x in e})
    want = _uf(edges, nodes)
    e = spark.createDataFrame(edges, schema)
    got = {r.node: r.root for r in dedup.connected_components(e, "u", "v").collect()}
    for n in nodes:
        got.setdefault(n, n)
    assert got == want


def test_cc_matches_union_find_long_ids(spark):
    """Path (worst case for naive label prop — forces the O(log n)
    rounds), random blobs, a star, self-loops, and duplicate edges."""
    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(40)]
    edges += [(rng.randrange(100, 150), rng.randrange(100, 150)) for _ in range(60)]
    edges += [(200 + i, 200) for i in range(1, 6)]
    edges += [(300, 300), (0, 1), (1, 0)]  # self-loop + duplicates
    _check_cc(spark, edges, "u long, v long")


def test_cc_matches_union_find_string_ids(spark):
    rng = random.Random(11)
    raw = [(rng.randrange(0, 80), rng.randrange(0, 80)) for _ in range(90)]
    edges = [(f"doc_{a:05d}", f"doc_{b:05d}") for a, b in raw]
    _check_cc(spark, edges, "u string, v string")


def test_phash_band_join_is_exact_for_small_hamming(spark):
    """Pigeonhole guarantee: with 4 bands, every pair within Hamming 3
    shares at least one untouched band — the banded join must equal the
    brute-force all-pairs result exactly (no approximate recall)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**63, size=40, dtype=np.int64)
    hashes = list(base)
    # plant near-dups at hamming 1..3 of existing hashes
    for i in range(20):
        h = int(base[i % len(base)])
        for _ in range(1 + i % 3):
            h ^= 1 << int(rng.integers(0, 64))
        hashes.append(np.int64(h))
    rows = [(f"img_{i:04d}", int(h)) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "image_id string, phash long")

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.phash_near_dup(df, max_hamming=3).collect()
    }

    # brute force over distinct hashes; rep = min (zero-padded) id per hash
    uh = sorted({int(h) for h in hashes})
    rep = {h: min(i for i, hh in rows if int(hh) == h) for h in uh}
    want = set()
    for x in range(len(uh)):
        for y in range(x + 1, len(uh)):
            d = bin((uh[x] ^ uh[y]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                a, b = sorted((rep[uh[x]], rep[uh[y]]))
                want.add((a, b, d))
    assert len(want) >= 15  # planted near-dups actually present
    assert got == want


def test_phash_hot_bucket_cap_is_exact(spark):
    """The chunk-pair hot-bucket guard changes only the plan, never the
    result: a randomized corpus with a deliberately HOT band bucket
    (hundreds of hashes sharing band 0's 16-bit value) must produce the
    identical pair set at every cap, including cap=1 (every multi-rep
    bucket chunked, per-bucket B = bucket_n)."""
    rng = np.random.default_rng(7)
    hashes = list(rng.integers(0, 2**63, size=60, dtype=np.int64))
    # hot bucket: 200 hashes identical in band 0 (low 16 bits), random above
    hot_low = 0x1234
    for _ in range(200):
        hashes.append(
            np.int64((int(rng.integers(0, 2**47)) << 16) | hot_low)
        )
    # planted near-dups inside the hot bucket (hamming 1-2 in high bits)
    for i in range(10):
        h = int(hashes[60 + i])
        h ^= 1 << int(rng.integers(17, 64))
        hashes.append(np.int64(h))
    rows = [(f"img_{i:04d}", int(h)) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "image_id string, phash long")

    def pairs(cap):
        return {
            (r.id_a, r.id_b, r.hamming, r.n_a, r.n_b)
            for r in dedup.phash_near_dup(df, max_bucket_reps=cap).collect()
        }

    want = pairs(None)  # the unguarded join is the ground truth
    assert len(want) >= 10  # planted hot-bucket near-dups found
    for cap in (1, 3, 50):
        assert pairs(cap) == want, f"cap={cap} diverged from uncapped"


def test_cluster_assign_keeps_one_per_cluster(spark):
    items = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = dedup.cluster_assign(items, pairs, "doc_id").collect()
    root = {r.doc_id: r.cluster_root for r in out}
    keep = {r.doc_id: r.is_keep for r in out}
    assert root == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}
    assert keep == {0: 1, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0, 7: 1, 8: 1, 9: 1}


def test_incremental_phash_dedup_semantics(spark):
    """Hand-built ingest: corpus hit (exact + near), batch-internal
    cluster, exact-dup batch group, bridge across two corpus keepers,
    and a clean singleton."""
    corpus = spark.createDataFrame(
        [("c1", 0x0F0F), ("c2", 0xF0F0_0000_0000_0000 - 2**63)],
        "image_id string, phash long",
    )
    batch = spark.createDataFrame(
        [
            ("b1", 0x0F0F),        # exact dup of corpus c1 -> drop
            ("b2", 0x0F0E),        # hamming 1 from c1 -> drop
            ("b3", 0x1111_0000),   # near-dups with b4 -> keep (min)
            ("b4", 0x1111_0001),   # -> drop, root b3
            ("b5", 0x1111_0000),   # exact dup of b3 -> drop, root b3
            ("b6", 0x7777_7777),   # singleton -> keep
        ],
        "image_id string, phash long",
    )
    out = {
        r.image_id: (r.cluster_root, r.is_keep)
        for r in dedup.incremental_phash_dedup(batch, corpus).collect()
    }
    assert out == {
        "b1": ("c1", 0),
        "b2": ("c1", 0),
        "b3": ("b3", 1),
        "b4": ("b3", 0),
        "b5": ("b3", 0),
        "b6": ("b6", 1),
    }


def test_incremental_phash_dedup_corpus_never_shuffles(spark):
    """The 10^12-corpus property: the corpus side of the candidate join
    must be map-side (batch bands broadcast) — no Exchange repartitions
    the corpus band stream, and the corpus never self-joins."""
    corpus = spark.range(0, 5000).selectExpr(
        "concat('c', id) as image_id", "id * 37 as phash"
    )
    batch = spark.range(0, 50).selectExpr(
        "concat('b', id) as image_id", "id * 37 as phash"
    )
    pairs_plan = (
        dedup.incremental_phash_dedup(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in pairs_plan
    # bridge across two corpus keepers resolves to the smaller corpus id
    c2 = spark.createDataFrame(
        [("ca", 0x00FF), ("cb", 0x03FF)], "image_id string, phash long"
    )
    b2 = spark.createDataFrame(
        [("bx", 0x01FF)],  # 1 bit from ca AND 1 bit from cb: a true bridge
        "image_id string, phash long",
    )
    out = {
        r.image_id: (r.cluster_root, r.is_keep)
        for r in dedup.incremental_phash_dedup(b2, c2).collect()
    }
    assert out == {"bx": ("ca", 0)}


def test_incremental_phash_dedup_long_ids(spark):
    """cluster_root must carry the FULL id — a fixed-width substring would
    truncate (and could collide) URL/path-derived ids longer than 64."""
    long_a = "img://bucket/" + "a" * 80
    long_b = "img://bucket/" + "b" * 80
    corpus = spark.createDataFrame(
        [(long_a, 0x0F0F)], "image_id string, phash long"
    )
    batch = spark.createDataFrame(
        [(long_b, 0x0F0E)], "image_id string, phash long"
    )
    rows = dedup.incremental_phash_dedup(batch, corpus).collect()
    assert rows[0].image_id == long_b
    assert rows[0].cluster_root == long_a  # full 93-char id, no truncation
    assert rows[0].is_keep == 0

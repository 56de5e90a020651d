"""Corpus-level dedup: near-dup pair graphs → connected components →
keep-one-per-cluster.

The reference dedups only by exact id (skip-if-done sets,
/root/reference/reblock/i_reblock.py:103-165); a training-data pipeline
needs the full chain: candidate pairs (MinHash/Jaccard/phash), a
component grouping over the pair graph, and a canonical keeper per
component. The pieces here:

- ``phash_near_dup``: image near-duplicates by perceptual-hash Hamming
  distance, banded-LSH style — but with a provable twist: splitting the
  64-bit phash into ``bands`` equal bands finds EVERY pair within
  Hamming distance ``bands - 1`` (pigeonhole: k differing bits touch at
  most k bands, so at least one band matches exactly). With the default
  ``max_hamming=2 < bands=4`` the candidate join is exact, not
  approximate, so the DuckDB oracle mirrors full semantics.
- ``connected_components``: the alternating large-star / small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC 2014) in pure DataFrame ops — O(log n) rounds even on
  path graphs, each round two shuffles (a groupBy-min and an equi-join),
  no collect_list (per-node state is a single min, so hub nodes cannot
  blow task memory) and no driver-side graph.
- ``cluster_assign``: items ∪ pairs → (id, cluster_root, is_keep) with
  exactly one keeper (the component-minimum id) per cluster.

100-TB design notes: exact-duplicate payloads are the dominant skew at
web scale (a boilerplate page can repeat 10^8 times); ``phash_near_dup``
collapses identical hashes to one representative FIRST (a single hash
aggregation), so band buckets hold distinct hashes only and the
self-join fan-out is bounded by distinct-hash collisions, not corpus
multiplicity. Group sizes ride along as ``n_a``/``n_b`` so multiplicity
is never lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BANDS = 4
PHASH_MAX_HAMMING = 2  # < PHASH_BANDS ⇒ banding is exact (pigeonhole)
PHASH_BUCKET_CAP = 4096  # chunk hot band-buckets above this many reps


def phash_near_dup(
    img: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    bands: int = PHASH_BANDS,
    phash_col: str = "phash",
    id_col: str = "image_id",
    max_bucket_reps: int | None = PHASH_BUCKET_CAP,
) -> DataFrame:
    """(id_a, id_b, hamming, n_a, n_b): near-duplicate image pairs by
    phash Hamming distance, between exact-duplicate GROUPS (id_a/id_b are
    each group's min image_id, n_a/n_b the group sizes; id_a < id_b).

    Plan: one hash aggregation collapses identical phashes; each distinct
    hash emits ``bands`` (band, 16-bit value) rows via ``stack`` (one
    Generate, no array explode); an equi-join on (band, value) yields
    candidates; ``bit_count(xor)`` verifies — all JVM-side codegen.

    Hot-bucket guard (``max_bucket_reps``): with 4 bands there are only
    65,536 distinct 16-bit band values, so at 10⁹+ distinct phashes an
    average bucket holds ~15k reps and a bare self-join materializes
    ~10⁸ candidate rows in ONE shuffle key per hot bucket. The guard is
    EXACT, never approximate — it changes only the plan shape: every
    bucket is split into ``B = ceil(bucket_n / max_bucket_reps)`` hash
    chunks and each rep is replicated to its B unordered chunk-pair keys
    (the same cogroup decomposition as similarity.near_dup_pairs), so a
    pair (a, b) meets under exactly one (band, bv, ci, cj) key and every
    within-bucket pair is still examined. Per-key rows are ≤
    2·max_bucket_reps and per-key join output ≤ max_bucket_reps² — hub
    buckets cost fan-out spread over B(B+1)/2 keys, never a straggler
    task. Cold buckets get B = 1 and degenerate to the plain equi-join.
    The bucket-count side table is ≤ bands·2^(64/bands) rows by
    construction, so it is force-broadcast whenever band values fit 16
    bits (bands ≥ 4 — no extra Exchange of the banded frame); with wider
    bands the bound degenerates to distinct-phash cardinality and the
    broadcast decision is left to AQE. ``max_bucket_reps=None`` restores
    the unguarded join."""
    width = 64 // bands
    mask = (1 << width) - 1
    g = img.groupBy(phash_col).agg(
        F.min(id_col).alias("rep"), F.count("*").alias("n")
    )
    stack_args = ", ".join(
        f"{b}, shiftright({phash_col}, {b * width}) & {mask}" for b in range(bands)
    )
    banded = g.select(
        "rep",
        "n",
        F.col(phash_col).alias("ph"),
        F.expr(f"stack({bands}, {stack_args}) as (band, bv)"),
    )
    if max_bucket_reps is None:
        cand = (
            banded.alias("a")
            .join(banded.alias("b"), ["band", "bv"])
            .where(F.col("a.rep") < F.col("b.rep"))
        )
    else:
        # three consumers (cnt + both self-join sides) would each re-run
        # the distinct-phash aggregation and the corpus scan beneath it —
        # truncate once (the CLAUDE.md multi-consumer rule)
        banded = banded.localCheckpoint(eager=False)
        cnt = banded.groupBy("band", "bv").agg(F.count("*").alias("bn"))
        # the "≤ bands·2^width rows by construction" broadcast bound only
        # holds while band values are ≤16 bits (bands ≥ 4 on a 64-bit
        # hash); with wider bands the count table is bounded only by
        # distinct phashes — let AQE decide instead of forcing a
        # driver-sized broadcast at the 10⁹-hash scale the guard targets
        if 64 // bands <= 16:
            cnt = F.broadcast(cnt)
        keyed = (
            banded.join(cnt, ["band", "bv"])
            .withColumn(
                "nb",
                F.ceil(F.col("bn") / F.lit(max_bucket_reps)).cast("int"),
            )
            .withColumn("c", F.pmod(F.xxhash64("rep"), F.col("nb")).cast("int"))
            .select(
                "band",
                "bv",
                "rep",
                "n",
                "ph",
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(0, nb - 1), k ->"
                        " named_struct('ci', least(c, cast(k as int)),"
                        " 'cj', greatest(c, cast(k as int))))"
                    )
                ).alias("ck"),
            )
            .select(
                "band", "bv", "rep", "n", "ph", "c",
                F.col("ck.ci").alias("ci"), F.col("ck.cj").alias("cj"),
            )
        )
        # a pair with chunks (ca, cb) meets under exactly the key
        # (min(ca,cb), max(ca,cb)); the chunk-role filter drops the
        # replicated co-occurrences under every other shared key
        cand = (
            keyed.alias("a")
            .join(keyed.alias("b"), ["band", "bv", "ci", "cj"])
            .where(
                (F.col("a.rep") < F.col("b.rep"))
                & (
                    ((F.col("a.c") == F.col("ci")) & (F.col("b.c") == F.col("cj")))
                    | ((F.col("a.c") == F.col("cj")) & (F.col("b.c") == F.col("ci")))
                )
            )
        )
    return (
        cand.select(
            F.col("a.rep").alias("id_a"),
            F.col("b.rep").alias("id_b"),
            F.col("a.ph").alias("pa"),
            F.col("b.ph").alias("pb"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()  # a pair can collide in several bands
        .withColumn(
            "hamming",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming", "n_a", "n_b")
    )


def phash_near_dup_sql(
    parquet_path: str,
    max_hamming: int = PHASH_MAX_HAMMING,
    bands: int = PHASH_BANDS,
) -> str:
    """DuckDB mirror of phash_near_dup (same banding, same verify)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
        with g as (
          select phash, min(image_id) as rep, count(*) as n
          from read_parquet('{parquet_path}') group by 1
        ),
        bands as (
          select rep, n, phash, b, (phash >> (b * {width})) & {mask} as bv
          from g, (select unnest(range(0, {bands})) as b)
        ),
        cand as (
          select distinct a.rep as id_a, b.rep as id_b,
                 a.phash as pa, b.phash as pb, a.n as n_a, b.n as n_b
          from bands a join bands b on a.b = b.b and a.bv = b.bv
                                   and a.rep < b.rep
        )
        select id_a, id_b, cast(bit_count(xor(pa, pb)) as int) as hamming,
               n_a, n_b
        from cand
        where bit_count(xor(pa, pb)) <= {max_hamming}
    """


def phash_clusters_sql(parquet_path: str) -> str:
    """DuckDB mirror of phash_clusters: recursive closure over the
    near-dup pair graph, expanded back through exact-dup groups.
    Self-contained (own WITH RECURSIVE) so it composes as a subquery."""
    pairs = phash_near_dup_sql(parquet_path)
    return f"""
        with recursive {cc_closure_sql(pairs)},
        reps as (
          select phash, min(image_id) as rep
          from read_parquet('{parquet_path}') group by 1
        )
        select i.image_id,
               coalesce(r.root, reps.rep) as cluster_root,
               cast(case when i.image_id = coalesce(r.root, reps.rep)
                    then 1 else 0 end as int) as is_keep
        from read_parquet('{parquet_path}') i
        join reps using (phash)
        left join roots r on r.u = reps.rep
    """


def _banded_groups(
    df: DataFrame, phash_col: str, id_col: str, bands: int
) -> DataFrame:
    """Distinct-hash groups (rep = min id per identical phash) exploded to
    ``bands`` (band, value) rows via one ``stack`` Generate."""
    width = 64 // bands
    mask = (1 << width) - 1
    g = df.groupBy(phash_col).agg(F.min(id_col).alias("rep"))
    stack_args = ", ".join(
        f"{b}, shiftright({phash_col}, {b * width}) & {mask}" for b in range(bands)
    )
    return g.select(
        "rep",
        F.col(phash_col).alias("ph"),
        F.expr(f"stack({bands}, {stack_args}) as (band, bv)"),
    )


def incremental_phash_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    bands: int = PHASH_BANDS,
    phash_col: str = "phash",
    id_col: str = "image_id",
) -> DataFrame:
    """Daily-ingest dedup: map each BATCH item against an already-deduped
    keeper ``corpus`` without ever re-clustering the corpus. Returns
    (id, cluster_root, is_keep) for batch items only: cluster_root is a
    corpus id when the item's near-dup component touches the corpus
    (the item is a duplicate of existing data → is_keep 0), else the
    component-minimum batch id (kept once per new component).

    The incremental cost property, which is the whole point at 10^12
    corpus rows: the corpus NEVER self-joins and NEVER shuffles — its
    band table is scanned once and map-side-joined against the
    BROADCAST batch bands, so a day's ingest costs
    O(|corpus| scan + |batch|-bounded join), not O(|corpus|^2).
    Corpus-corpus candidate pairs are excluded by construction (the
    corpus is assumed already deduped at this threshold); a batch item
    bridging two corpus keepers maps to the smaller corpus id.

    Priority encoding: ids ride as '0|id' (corpus) / '1|id' (batch), so
    every min/root computation in the star algorithm prefers corpus
    nodes lexicographically — no special-casing inside the CC kernel."""
    b = batch.select(
        F.concat(F.lit("1|"), F.col(id_col)).alias("pid"), F.col(phash_col)
    )
    c = corpus.select(
        F.concat(F.lit("0|"), F.col(id_col)).alias("pid"), F.col(phash_col)
    )
    bb = _banded_groups(b, phash_col, "pid", bands)
    cb = _banded_groups(c, phash_col, "pid", bands)

    def _verify(cand):
        return (
            cand.select(
                F.col("a.rep").alias("id_a"),
                F.col("b.rep").alias("id_b"),
                F.col("a.ph").alias("pa"),
                F.col("b.ph").alias("pb"),
            )
            .distinct()  # a pair can collide in several bands
            .where(
                F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                <= F.lit(max_hamming)
            )
            .select("id_a", "id_b")
        )

    cand_bc = cb.alias("a").join(F.broadcast(bb).alias("b"), ["band", "bv"])
    cand_bb = (
        bb.alias("a")
        .join(bb.alias("b"), ["band", "bv"])
        .where(F.col("a.rep") < F.col("b.rep"))
    )
    pairs = _verify(cand_bc).unionByName(_verify(cand_bb))
    cc = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "rep"
    )
    breps = b.groupBy(phash_col).agg(F.min("pid").alias("rep"))
    root = F.coalesce("root", F.col("rep"))
    return (
        b.join(breps, phash_col)
        .join(cc, "rep", "left")
        .select(
            F.expr("substring(pid, 3)").alias(id_col),
            # unbounded strip of the 2-char priority prefix — a fixed
            # length cap would truncate (and could collide) long ids
            root.substr(F.lit(3), F.length(root)).alias("cluster_root"),
            (root == F.col("pid")).cast("int").alias("is_keep"),
        )
    )


def cc_closure_sql(pairs_sql: str, a: str = "id_a", b: str = "id_b") -> str:
    """DuckDB oracle for connected components over a pair query: a
    recursive transitive closure (fine at oracle scale; the engine side
    is the O(log n)-round star algorithm, NOT this quadratic walk).
    Returns (u, root) for every node that appears in a pair."""
    return f"""
        sym as (
          select {a} as u, {b} as v from ({pairs_sql})
          union
          select {b} as u, {a} as v from ({pairs_sql})
        ),
        walk(u, v) as (
          select u, v from sym
          union
          select w.u, s.v from walk w join sym s on w.v = s.u
        ),
        roots as (
          select u, least(u, min(v)) as root from walk group by u
        )
    """


def connected_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 25
) -> DataFrame:
    """(node, root) for every non-root node of the pair graph; roots are
    each component's minimum node id (total order = the column's own
    ordering, identical in Spark and DuckDB for the fixed-width ids used
    here).

    Alternating large-star / small-star (Kiveris et al. 2014): both
    steps are a groupBy-min plus an equi-join — per-node state is ONE
    value, so a 10^8-degree hub costs a wide join fan-out but never an
    executor OOM. Edges are localCheckpoint-ed per round to truncate the
    iterative lineage. Converges when the edge multiset is stable
    (count + order-independent hash signature), at which point the edge
    set IS the star mapping."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for it in range(max_iter):
        # large-star: every neighbor v > u links to min(N(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: every smaller neighbor (and u itself) links to the min
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        out1 = (
            ls.join(mins2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        out2 = mins2.select("u", F.col("m").alias("v"))
        e = out1.union(out2).distinct().localCheckpoint(eager=True)
        # checkpoint EVERY round (letting two rounds ride one lineage was
        # measured 35% SLOWER at sf0.1 — the next round re-executes the
        # prior round's two shuffles), but probe convergence every 2nd
        # round only: the probe is a driver round-trip on top of the
        # checkpoint job and the star algorithm needs ~log n rounds, so
        # odd-round probing halves the chatter for at most one extra
        # (cheap, stable) round
        if it % 2 == 0 and it + 1 < max_iter:
            continue
        sig = e.agg(
            F.count("*").alias("n"),
            # decimal sum: ANSI mode would raise on long overflow
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)
    return e.select(F.col("u").alias("node"), F.col("v").alias("root"))


def phash_clusters(
    img: DataFrame, id_col: str = "image_id", phash_col: str = "phash"
) -> DataFrame:
    """(image_id, cluster_root, is_keep) for the whole image corpus:
    exact-dup groups collapse to a per-phash representative first (the
    skew guard — a billion byte-identical thumbnails cost one groupBy,
    never a pair explosion), banded-Hamming near-dup pairs connect the
    representatives, and the component root expands back through the
    exact-dup groups. is_keep marks the one canonical copy per cluster."""
    pairs = phash_near_dup(img, phash_col=phash_col, id_col=id_col)
    reps = img.groupBy(phash_col).agg(F.min(id_col).alias("rep"))
    cc = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "rep"
    )
    return (
        img.select(id_col, phash_col)
        .join(reps, phash_col)
        .join(cc, "rep", "left")
        .select(id_col, F.coalesce("root", F.col("rep")).alias("cluster_root"))
        .withColumn(
            "is_keep", (F.col(id_col) == F.col("cluster_root")).cast("int")
        )
    )


def cluster_assign(
    items: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id, cluster_root, is_keep): every item mapped to its near-dup
    component root (itself if unpaired); is_keep = 1 for exactly the
    component-minimum item — the dedup 'keep one canonical copy' step."""
    cc = connected_components(pairs, src, dst).withColumnRenamed("node", id_col)
    return (
        items.select(id_col)
        .join(cc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("root", F.col(id_col)).alias("cluster_root"),
        )
        .withColumn(
            "is_keep", (F.col(id_col) == F.col("cluster_root")).cast("int")
        )
    )

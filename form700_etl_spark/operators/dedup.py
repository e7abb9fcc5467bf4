"""Deduplication operator library (build plan M5).

Reusable DataFrame->DataFrame builders; the oracle-checked queries in
``queries/dedup.py`` are thin wrappers over these.  All base hashing is
md5 (minhash permutations are affine maps over one md5-derived 32-bit
int) so results are reproducible across engines and runs.

Scale design (100 TB):
- ``shingle``: one narrow shuffle (distinct on (doc, shingle)).
- ``minhash_signatures``: the whole K-wide signature in ONE aggregation
  pass with map-side partial mins — state per doc is K fixed-width
  strings, independent of doc length.
- ``lsh_candidates``: bands shuffle on (band, key); only colliding
  docs meet.  With b bands of r rows the match threshold is the usual
  (1/b)^(1/r) S-curve.
- ``verify_jaccard``: joins candidates back to the inverted index —
  cost scales with candidate count, not n².
- hot-shingle cap (``max_shingle_df``): drops shingles appearing in
  more than N docs before any pair join — the skew guard that keeps a
  100 TB corpus from shuffling a stop-phrase's n² pairs.

Algorithms from the public literature: MinHash resemblance sketches
(Broder, "On the resemblance and containment of documents", 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
ch. 3); SimHash (Charikar, "Similarity estimation techniques from
rounding algorithms", STOC 2002).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
BAND_ROWS = 3  # -> 4 bands
# Hot-shingle document-frequency cap used by the pair-join consumers
# (queries.dedup.dedup_ngram_jaccard / dedup_clusters_connected pass it
# as shingle(max_shingle_df=...), with the identical df filter in their
# DuckDB oracles): a shingle shared by k docs emits k^2/2 pair rows in
# an inverted-index self-join, so one stop-phrase at corpus scale is a
# shuffle-skew blowup.  df > MAX_SHINGLE_DF shingles are dropped BEFORE
# the join and Jaccard is computed over the capped shingle space on
# both engines, keeping oracle parity exact.
#
# Recall caveat: an exact/near-duplicate cluster of more than
# MAX_SHINGLE_DF docs shares ALL its shingles, so the cap erases the
# whole cluster from the Jaccard/LSH view.  That is by design here —
# identical-text clusters belong to exact_dedup_groups (one cheap
# hash-groupBy, run it first; training_pipeline_end_to_end does), and
# at a given corpus size the cap must be chosen above the largest
# near-dup cluster that exact dedup cannot collapse.
MAX_SHINGLE_DF = 16


def shingle(documents: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id",
            max_shingle_df: int | None = None, distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per document: (doc_id, shingle).

    perf: the token array is materialized once per row before the
    transform lambda — referencing split() inside the lambda re-splits
    the whole text per element (O(len²) per doc).

    ``distinct=False`` skips the corpus-wide dedup shuffle — correct for
    consumers that are duplicate-insensitive (min-hash signatures) and
    the single biggest cost at scale; set-semantics consumers (Jaccard)
    should dedup AFTER restricting to the docs they actually touch.

    If the source exposes fewer partitions than cores (one small file),
    the per-shingle hash work downstream would serialize onto one task;
    fan the docs out first.  On a real corpus (many files >> cores) the
    condition is false and no extra shuffle happens.
    """
    sc = documents.sparkSession.sparkContext
    if documents.rdd.getNumPartitions() < sc.defaultParallelism:
        documents = documents.repartition(sc.defaultParallelism)
    idx = ", ".join(f"toks[i+{k}]" for k in range(n))
    expr = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {idx})) "
        "ELSE array() END"
    )
    out = (
        documents.select(F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("toks"))
        .select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
    )
    if distinct:
        out = out.distinct()
    if max_shingle_df is not None:
        hot = (
            out.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        out = out.join(F.broadcast(hot), "shingle", "left_anti")
    return out


# Universal-hash minhash family (Broder 1997; Carter/Wegman universal
# hashing): ONE md5 per shingle yields a 32-bit integer x, and the K
# "permutations" are affine maps h_k(x) = (A_k*x + B_k) mod P computed
# with plain int64 arithmetic.  K md5-per-shingle (the naive encoding)
# is the kernel cost of minhash at 100 TB; this is ~K times cheaper
# and exactly mirrored by the DuckDB oracle (A_k < 2^31 and x < 2^32
# keep every product below 2^63 — no overflow in either engine).
# Known tradeoff of deriving all K from one base hash (Spark's builtin
# MinHashLSH does the same): the h_k are correlated, so slightly more
# false band collisions reach the exact-Jaccard verify, which filters
# them — candidate count rises a little, correctness is unaffected.
MINHASH_P = 4_294_967_311  # smallest prime > 2^32


def minhash_params(n_hashes: int = N_HASHES) -> list[tuple[int, int]]:
    """Deterministic (A_k, B_k) affine coefficients, shared with the
    oracle SQL generator."""
    return [(2_000_006 * (k + 1) + 1, 777_767 * (k + 1)) for k in range(n_hashes)]


def minhash_signatures(shingles: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """K min-hashes per doc (columns h0..h{K-1}) in one aggregation
    pass.  The base hash x is projected BEFORE the aggregate so the md5
    runs once per shingle row regardless of K."""
    x = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    hashed = shingles.select("doc_id", x.alias("x"))
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{k}")
            for k, (a, b) in enumerate(minhash_params(n_hashes))
        ]
    )


def lsh_candidates(signatures: DataFrame, band_rows: int = BAND_ROWS,
                   n_hashes: int = N_HASHES, materialize: bool = True) -> DataFrame:
    """Band the signatures and emit distinct colliding pairs (doc1 < doc2).

    ``materialize=True`` localCheckpoints the banded table before the
    self-join: both join sides otherwise re-evaluate the ENTIRE
    upstream lineage (corpus scan + shingle explode + K-wide min agg)
    — at 100 TB that is two extra full-corpus passes to build a table
    that is only O(n_docs x n_bands) rows."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(",", *[F.col(f"h{b * band_rows + r}") for r in range(band_rows)])
            ).alias("key"),
        )
        for b in range(n_hashes // band_rows)
    ]
    bands = signatures.select("doc_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    if materialize:
        bands = bands.localCheckpoint()
    b1 = bands.select(F.col("doc_id").alias("doc1"), "band", "key")
    b2 = bands.select(F.col("doc_id").alias("doc2"), "band", "key")
    return (
        b1.join(b2, ["band", "key"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, shingles: DataFrame, threshold: float | None = None,
                   round_to: int = 6, shingles_distinct: bool = True,
                   pairs_materialized: bool = False,
                   with_containment: bool = False) -> DataFrame:
    """Exact Jaccard for each candidate pair via the inverted index:
    the (doc2, shingle) join touches only shared shingles.

    ``with_containment=True`` additionally emits Broder containment
    (common / min(n1, n2)) — the asymmetric overlap measure that
    catches a small document embedded inside a much larger one, where
    Jaccard is diluted by the size gap (Broder, "On the resemblance
    and containment of documents", SEQUENCES 1997).

    With ``shingles_distinct=False`` the input may carry duplicate
    (doc, shingle) rows; they are deduped HERE, after a broadcast
    semi-join down to the candidate docs — at scale this replaces a
    corpus-wide distinct shuffle with one over a few hundred docs.

    The pair set and the candidate-restricted shingle set are each
    consumed by MULTIPLE downstream joins; both are localCheckpointed
    so the (potentially full-corpus) lineage behind them runs once,
    not once per consumer.  Both are O(candidates) — tiny.  Callers
    that already materialized ``pairs`` pass ``pairs_materialized=True``
    to skip a redundant second checkpoint copy."""
    if not pairs_materialized:
        pairs = pairs.localCheckpoint()
    if not shingles_distinct:
        cand_docs = (
            pairs.select(F.col("doc1").alias("doc_id"))
            .unionByName(pairs.select(F.col("doc2").alias("doc_id")))
            .distinct()
        )
        shingles = (
            shingles.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .distinct()
            .localCheckpoint()
        )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.select(F.col("doc_id").alias("doc1"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc2"), "shingle")
    common = (
        pairs.join(a, "doc1")
        .join(b, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    jac = F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common"))
    out = common.join(s1, "doc1").join(s2, "doc2")
    if threshold is not None:
        out = out.filter(jac >= threshold)
    cols = ["doc1", "doc2", F.round(jac, round_to).alias("jaccard")]
    if with_containment:
        cont = F.col("common").cast("double") / F.least(F.col("n1"), F.col("n2"))
        cols.append(F.round(cont, round_to).alias("containment"))
    return out.select(*cols)


def connected_components(pairs: DataFrame, max_iter: int = 20,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """Connected components over an undirected pair graph
    ((doc1, doc2) edges) — near-dup PAIRS become dedup CLUSTERS (each
    cluster keeps min-doc_id as canonical).  Returns (doc_id,
    component_id).

    Hybrid strategy, chosen by undirected pair count:

    - ``n_pairs <= driver_threshold``: pull the pair list to the driver
      as Arrow columns and run union-find there.  The LSH/Jaccard pair
      graph is already the similarity-pruned RESIDUE of the corpus —
      even at 100 TB it is typically millions of edges, not billions,
      and a 1M-pair Arrow transfer (two int64 columns ≈ 16 MB; NOT 1M
      Python Row objects) + O(n alpha(n)) union-find beats paying
      diameter-many distributed shuffle rounds of pure scheduling
      overhead.  This is the same judgment call as broadcasting a
      small join side.
    - larger graphs: Pregel-style iterative min-label propagation
      (each node repeatedly takes the min label among itself and its
      neighbors; <= diameter iterations, one shuffle each; the loop
      stops early at a fixed point).  No collect — scales to any edge
      count.

    ``driver_threshold`` counts UNDIRECTED pairs as emitted by the
    LSH/Jaccard stage (one row per {doc1, doc2}), not symmetrized
    directed edges — a threshold of 1M admits graphs of up to 2M
    directed edges to the driver path.  Both paths produce identical
    labels (min doc_id per component)."""
    # Probe WITHOUT a driver transfer: persist the pair frame (lazy),
    # then count() — ONE job whose result is a single long, so the
    # BIG-graph path ships zero pair rows to the driver (the old shape
    # collected threshold+1 Row objects, hundreds of MB, just to discard
    # them).  A limit(t+1).count() probe would stop scanning early on
    # huge graphs, but CollectLimit executes as several incremental
    # scale-up jobs and the full count is never wasted here: it
    # populates the cache that either the small path's Arrow toPandas or
    # the Pregel path's localCheckpoint immediately drains.  Small path
    # total: exactly two actions, pair lineage computed once.  The probe
    # cache is DISK_ONLY: on the big path the localCheckpoint writes a
    # second (block-store) copy before this one is dropped, and holding
    # two memory-resident copies of a billion-edge list at peak would
    # undercut the any-edge-count claim — spilling the probe copy keeps
    # the peak at one in-memory copy plus one sequential-disk copy.
    from pyspark import StorageLevel

    pairs = pairs.select("doc1", "doc2").persist(StorageLevel.DISK_ONLY)
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        pdf = pairs.toPandas()  # Arrow path: two int64 numpy columns
        pairs.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["doc1"].tolist(), pdf["doc2"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so the canonical label is min(doc_id)
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        spark = pairs.sparkSession
        out = [(x, find(x)) for x in parent]
        return spark.createDataFrame(out, "doc_id long, component_id long")
    # Pregel path: materialize the pairs once (the symmetrizing union
    # has two branches that would each re-run the pair lineage), then
    # iterate min-label propagation.  localCheckpoint is eager, so the
    # probe-time cache can be dropped immediately after.
    pairs_cached = pairs
    pairs = pairs.localCheckpoint()
    pairs_cached.unpersist()
    edges = (
        pairs.select(F.col("doc1").alias("a"), F.col("doc2").alias("b"))
        .unionByName(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
        .localCheckpoint()
    )
    n_edges = edges.count()
    # size the loop's parallelism to the graph, not the session default —
    # per-iteration scheduling overhead dominates at high partition counts
    n_parts = max(1, min(32, n_edges // 100_000 + 1))
    edges = edges.repartition(n_parts, "b").localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("component_id"))


def exact_dedup_groups(documents: DataFrame, key: F.Column | None = None,
                       id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: fingerprint -> (group_size, canonical
    min-id representative)."""
    fp = key if key is not None else F.md5("text")
    d = documents.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
    return d.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("canonical_id"),
    )


def incremental_lsh_probe(
    sig_new: DataFrame,
    sig_old: DataFrame,
    band_rows: int = BAND_ROWS,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Incremental near-dup: band an INCOMING batch's signatures and
    probe them against the EXISTING corpus index — no self-join over
    the whole corpus.  Returns candidate (new_doc, old_doc) pairs.

    This is how dedup runs in production once the corpus exists: the
    old side is a precomputed banded index (bucketed table on
    (band, key) at scale — only matching buckets are read); the new
    side is one batch, small enough to BROADCAST, so probing 1M new
    docs against a 10B-doc index moves only the batch, never the
    index.  Signatures use the same md5-affine family as the batch
    operator, so an index built by one is probe-compatible with the
    other."""

    def _bands(sig: DataFrame, out: str) -> DataFrame:
        structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"h{b * band_rows + r}") for r in range(band_rows)]
                    )
                ).alias("key"),
            )
            for b in range(n_hashes // band_rows)
        ]
        return sig.select(
            F.col("doc_id").alias(out), F.explode(F.array(*structs)).alias("bk")
        ).select(out, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    old_bands = _bands(sig_old, "old_doc")
    new_bands = _bands(sig_new, "new_doc")
    return (
        old_bands.join(F.broadcast(new_bands), ["band", "key"])
        .select("new_doc", "old_doc")
        .distinct()
    )

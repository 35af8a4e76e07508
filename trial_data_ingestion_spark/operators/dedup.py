"""Deduplication operators (reference P5/A5 + north-star extensions).

Reference surface: exact keep-first dedup by key
(``preprocessing/doi_utils.py:47,59`` — ``drop_duplicates`` on
``doi_norm``).  North-star extensions for training-data pipelines:
content-hash dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (100 TB):
  * Exact dedup is one hash-partitioned shuffle on the key; with AQE
    the partial aggregation happens map-side first.
  * MinHash signatures are computed with *native* higher-order
    functions (shingle -> md5 -> min), entirely inside whole-stage
    codegen — no Python worker in the signature path.  The LSH
    band-bucket join turns the O(n^2) pair problem into a shuffle on
    band buckets; candidate verification is a self-join on bucket keys
    only.  Banding keys are low-cardinality-safe: bucket =
    (band_index, band_signature) so no single reducer sees more than
    one band's collisions.
  * md5 (not xxhash64) is used for signature hashing so results are
    engine-portable and the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def dedup_exact(df: DataFrame, keys: list[str],
                order_col: str | None = None) -> DataFrame:
    """P5 — keep-first dedup by key.

    With ``order_col`` the "first" row is deterministic under any
    partitioning (reference keeps pandas row order, which Spark cannot
    reproduce without an explicit order column — SURVEY.md §7 hard
    parts).  Without it, falls back to ``dropDuplicates``.
    """
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))


def dedup_by_content_hash(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """Content-hash exact dedup: sha256 over whitespace-normalized
    text, keep the row with the minimal id per hash group."""
    norm = F.sha2(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), 256)
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (df.withColumn("__h", norm)
              .withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__h", "__rn"))


# --------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# --------------------------------------------------------------------------

def _hash64(c: Column) -> Column:
    """Portable 60-bit integer hash of a string: first 15 hex chars of
    md5, base-16 -> decimal.  Identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _hash_hex(c: Column) -> Column:
    """Portable hash as a fixed-width lowercase hex string (first 15
    md5 chars).  Lexicographic order on fixed-width hex == numeric
    order, so ``min`` over these is a valid MinHash — and any engine
    with md5 reproduces it exactly (the DuckDB oracle relies on this;
    no base-16 integer conversion needed anywhere)."""
    return F.substring(F.md5(c), 1, 15)


def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct k-char shingles of the whitespace-normalized text as an
    array column (sequence -> substring).  Convenient for small inputs;
    the scalable path is :func:`shingle_table` (exploded, codegen'd)."""
    norm = F.trim(F.regexp_replace(text, r"\s+", " "))
    idx = F.sequence(F.lit(1),
                     F.greatest(F.lit(1), F.length(norm) - F.lit(k - 1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


from trial_data_ingestion_spark.session import (
    ensure_parallelism as _ensure_parallelism,
)


def shingle_table(df: DataFrame, id_col: str, text_col: str,
                  k: int = 8) -> DataFrame:
    """Exploded (doc, shingle) table — the scale-path representation.

    Higher-order array functions are *interpreted* in Spark (no
    whole-stage codegen), which made an array-based MinHash ~100x
    slower per doc.  Exploding shingle positions keeps every
    expression (substring, md5, min) inside codegen, and the follow-up
    ``groupBy(doc)`` aggregation gets map-side partial combine.

    NOT deduplicated: min-over-multiset == min-over-set, so MinHash
    signatures don't need a distinct; Jaccard verification applies
    ``.distinct()`` itself.
    """
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        _ensure_parallelism(df.select(F.col(id_col).alias("doc"),
                                      norm.alias("__txt"))
                              .where(F.length("__txt") > 0))
          .select("doc", F.explode(F.sequence(
              F.lit(1),
              F.greatest(F.lit(1), F.length("__txt") - F.lit(k - 1))))
              .alias("__i"), "__txt")
          .select("doc", F.col("__txt").substr(F.col("__i"), F.lit(k))
                  .alias("s"))
    )


#: Mersenne prime 2^31-1 — modulus of the Carter-Wegman family.
#: With x, c1, c2 < 2^31 every product stays under 2^62, so the
#: arithmetic is overflow-free in any signed-64 engine (Spark longs,
#: DuckDB BIGINT) while the ``mod`` still wraps the product many times
#: over — full avalanche, unlike a modulus larger than the products
#: (which would make the family order-preserving and collapse LSH
#: selectivity: correlated mins -> every band colliding).
MERSENNE_31 = (1 << 31) - 1


def cw_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (c1, c2) pairs, c1 in [1, 2^31-2], c2 in
    [0, 2^31-2], for h_i(x) = (c1*x + c2) mod 2^31-1 — from a
    fixed-seed LCG so the DuckDB oracle can inline identical
    constants."""
    out, x = [], 0x9E3779B97F4A7C15
    for _ in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        c1 = 1 + (x >> 32) % (MERSENNE_31 - 1)
        c2 = (x & 0xFFFFFFFF) % MERSENNE_31
        out.append((c1, c2))
    return out


def _cw_hashes(a: Column, num_hashes: int) -> list[Column]:
    """``num_hashes`` independent hashes of a 60-bit value:
    x = a mod 2^31-1, then h_i = (c1_i*x + c2_i) mod 2^31-1 (the
    classic universal family over Z_p).

    One md5 per input feeds the whole family — versus one md5 per
    (input, hash function) this cuts the dominant signature cost by
    ~num_hashes x, and every derivation is two codegen'd long ops."""
    x = a % F.lit(MERSENNE_31)
    return [
        ((F.lit(c1) * x + F.lit(c2)) % F.lit(MERSENNE_31))
        for (c1, c2) in cw_constants(num_hashes)
    ]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k: int = 8, num_hashes: int = 32) -> DataFrame:
    """One row per doc with long columns ``h0..h{n-1}`` (Carter-Wegman
    MinHash values).  Single shuffle: groupBy(doc) with ``num_hashes``
    partial-min aggregates; one md5 per shingle; everything codegen'd."""
    sh = shingle_table(df, id_col, text_col, k)
    hashed = sh.select("doc", _hash64(F.col("s")).alias("__a"))
    aggs = [F.min(h).alias(f"h{i}")
            for i, h in enumerate(_cw_hashes(F.col("__a"), num_hashes))]
    return hashed.groupBy("doc").agg(*aggs)


def lsh_candidate_probability(s: float, bands: int,
                              rows_per_band: int) -> float:
    """P(a pair at Jaccard similarity ``s`` becomes an LSH candidate)
    under ``bands`` bands of ``rows_per_band`` MinHashes each — the
    standard S-curve 1 - (1 - s^r)^b (Mining of Massive Datasets,
    ch. 3).  Driver-side arithmetic for planning and tests."""
    return 1.0 - (1.0 - s ** rows_per_band) ** bands


def lsh_plan(threshold: float, num_hashes: int = 128,
             false_negative_weight: float = 5.0) -> dict:
    """Choose (bands, rows_per_band) for a target Jaccard threshold:
    the banding whose S-curve loses the least probability mass to the
    wrong side of ``threshold`` — integrated false-negative mass
    above it (pairs the blocking MISSES, weighted
    ``false_negative_weight`` because dedup silently keeping a
    duplicate costs more than verifying a spurious candidate) plus
    false-positive mass below it.

    Returns ``{bands, rows_per_band, num_hashes, midpoint}`` with
    ``num_hashes = bands * rows_per_band`` (<= the requested budget;
    only exact factorizations are considered) and ``midpoint`` the
    similarity where the curve crosses 1/2 — the classic
    ``(1/b)^(1/r)`` rule-of-thumb anchor, within a few percent of
    ``threshold`` for any sane budget.  Feed the result straight into
    :func:`dedup_minhash` / :func:`minhash_lsh_candidates`.

    At 100 TB the planner matters because bands trade shuffle volume
    (b bucket rows per doc) against verify volume (candidate pairs):
    picking b, r by curve fit instead of folklore keeps both sides
    budgeted as the threshold moves."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    steps = 200
    best = None
    for r in range(1, num_hashes + 1):
        b = num_hashes // r
        if b < 1:
            break
        # integrate |curve - ideal step at threshold| on a grid
        cost = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = lsh_candidate_probability(s, b, r)
            if s >= threshold:
                cost += false_negative_weight * (1.0 - p)
            else:
                cost += p
        if best is None or cost < best[0]:
            best = (cost, b, r)
    _, b, r = best
    return {"bands": b, "rows_per_band": r, "num_hashes": b * r,
            "midpoint": (1.0 / b) ** (1.0 / r)}


#: corpus size at which the graded default banding (4 bands x 4 rows)
#: is calibrated; :func:`auto_banding` steepens from here
AUTO_BANDING_ANCHOR_DOCS = 10_000


def auto_banding(n_docs: int, threshold: float = 0.8,
                 base_bands: int = 4, base_rows: int = 4,
                 max_hashes: int = 512) -> dict:
    """Deployment banding for a corpus of ``n_docs``: the LSH twin of
    ``similarity.srp_auto_planes`` and the fuzzy join's gram-length
    rule — selectivity must track log(corpus).

    With FIXED banding the candidate set grows superlinearly: chance
    band collisions over corpus-common shingles are a birthday term
    (pairs ~ n^2 * P(collision | unrelated)), measured on the bench
    corpus as 440 -> 15,727 -> 1,163,016 candidate pairs across two
    10x decades at (4, 4) (``Q19_SCALE_PROFILE.json``), all inherited
    by the exact-Jaccard verify.  The cure steepens the S-curve:
    ``rows_per_band`` +1 per decade beyond the anchor multiplies the
    per-band chance-collision probability by roughly the corpus's
    min-hash collision rate (<< 1/10), outrunning the decade's 10x.

    ``bands`` then RESTORES recall **at the caller's threshold**: it
    starts from the +2-per-decade schedule and grows until the
    S-curve's candidate probability at ``threshold`` is back to at
    least the anchor setting's at that same threshold — a floor in
    ``threshold``, not just at the 0.8 the schedule was tuned on.
    (At 0.8 the floor is already met by the schedule: 0.88 at (4,4)
    -> 0.91 at (6,5) -> 0.91 at (8,6), the graded/measured settings.
    At 0.7 two decades out the schedule alone would DROP recall
    0.67 -> 0.63 and at 0.5 halve it 0.23 -> 0.12 — silently keeping
    most true duplicates; the floor grows bands to 9 and 17 instead.)
    A shallow threshold on a huge corpus may need more bands than
    ``max_hashes`` admits; the plan is then capped and a
    ``UserWarning`` reports the achieved recall — the caller's cue to
    raise the hash budget or re-think the threshold.  The cap bounds
    the WHOLE plan: if the base decade schedule alone would exceed
    ``max_hashes`` (a small caller budget on a huge corpus), the
    schedule is shrunk to fit — ``bands * rows_per_band <=
    max_hashes`` holds on every return path — and the same recall
    warning reports what the budget costs.

    Measured at 100x rows (threshold 0.8): candidates linear (126k),
    steady wall 9.1 s vs 34 s fixed.

    Returns ``{bands, rows_per_band, num_hashes, midpoint, recall}``
    ready to feed :func:`dedup_minhash` /
    :func:`minhash_lsh_candidates`; ``midpoint`` is the S-curve's
    half-probability similarity, ``recall`` the candidate probability
    at exactly ``threshold`` (>= the anchor's unless capped)."""
    import math
    import warnings
    if n_docs < 0:
        raise ValueError("n_docs must be non-negative")
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if max_hashes < 1:
        raise ValueError("max_hashes must be >= 1")
    decades = max(0, math.ceil(math.log10(
        max(n_docs, 1) / AUTO_BANDING_ANCHOR_DOCS)))
    rows = base_rows + decades
    anchor_recall = lsh_candidate_probability(threshold, base_bands,
                                              base_rows)
    bands = base_bands + 2 * decades
    # the cap bounds the WHOLE plan, not just the recall-growth loop:
    # a small caller budget (max_hashes=32 at 500k docs, schedule 48)
    # must never silently exceed max_hashes — shrink the schedule to
    # fit (rows first only if a single band already overflows) and let
    # the recall warning below report the cost
    if bands * rows > max_hashes:
        if rows > max_hashes:
            rows = max(1, max_hashes)
        bands = max(1, max_hashes // rows)
    while (lsh_candidate_probability(threshold, bands, rows)
           < anchor_recall and (bands + 1) * rows <= max_hashes):
        bands += 1
    recall = lsh_candidate_probability(threshold, bands, rows)
    if recall < anchor_recall:
        warnings.warn(
            f"auto_banding: hash budget max_hashes={max_hashes} caps "
            f"bands at {bands} (rows_per_band={rows}); recall at "
            f"threshold {threshold} is {recall:.3f} < the anchor "
            f"setting's {anchor_recall:.3f} — raise max_hashes or "
            f"the threshold", UserWarning, stacklevel=2)
    return {
        "bands": bands,
        "rows_per_band": rows,
        "num_hashes": bands * rows,
        "midpoint": (1.0 / bands) ** (1.0 / rows),
        "recall": recall,
    }


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str,
                           k: int = 8, num_hashes: int = 32,
                           bands: int = 8) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    signatures -> per-band bucket key (concat of the band's hashes) ->
    explode to (doc, band, bucket) -> self-join on bucket -> distinct
    (a < b) pairs.  The self-join shuffles on band buckets only; at
    100 TB this is the standard scalable near-dup plan (signatures are
    a few hundred bytes/doc regardless of doc size).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[
                         F.col(f"h{b * rows_per_band + r}")
                         for r in range(rows_per_band)
                     ]).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.bucket") == F.col("b.bucket"),
                      F.col("a.doc") < F.col("b.doc")])
         .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
         .distinct()
    )


def jaccard_verify(df: DataFrame, candidates: DataFrame, id_col: str,
                   text_col: str, k: int = 8,
                   threshold: float = 0.8,
                   pinned: list | None = None) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs via the exploded
    shingle table: |A ∩ B| from a shingle equi-join restricted to
    candidate pairs, |A ∪ B| = |A| + |B| - |A ∩ B|.  Only candidate
    pairs pay the set-intersection cost — the point of LSH
    prefiltering.

    Scale note: shingles are built ONLY for docs that appear in a
    candidate pair (left-semi prefilter).  At 100 TB the candidate set
    is orders of magnitude smaller than the corpus, so verification
    cost is bounded by LSH recall, not corpus size."""
    in_cands = (candidates.select(F.col("doc_a").alias(id_col))
                .union(candidates.select(F.col("doc_b").alias(id_col)))
                .distinct())
    df = df.join(in_cands, id_col, "left_semi")
    # Pinned: the distinct shingle set of candidate docs feeds three
    # consumers (sizes, doc_a side, doc_b side) — without pinning it the
    # explode+distinct subtree would run three times.  Size is bounded
    # by the candidate set, not the corpus.  A LAZY persist,
    # deliberately: r8 tried an eager localCheckpoint here and it
    # OOM'd the 100x scale tier — the standalone checkpoint job
    # materializes every shingle partition at once, where the lazy
    # cache fills as the consumer pipeline streams through.  The
    # persist has no matching unpersist HERE because the returned plan
    # still reads it; callers that must not leak a cached frame per
    # call (the incremental delta-ingest loops) pass ``pinned`` and
    # unpersist after pinning their own decision, while batch
    # operators keep the session-lifetime cache (the documented
    # curation-persist ownership trade).
    shd = shingle_table(df, id_col, text_col, k).distinct().persist()
    if pinned is not None:
        pinned.append(shd)
    sizes = shd.groupBy("doc").agg(F.count(F.lit(1)).alias("nsh"))
    inter = (
        candidates
        .join(shd.withColumnsRenamed({"doc": "doc_a"}), "doc_a")
        .join(shd.withColumnsRenamed({"doc": "doc_b", "s": "s_b"}), "doc_b")
        .where(F.col("s") == F.col("s_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    return (
        inter
        .join(sizes.withColumnsRenamed({"doc": "doc_a", "nsh": "nsh_a"}),
              "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "nsh": "nsh_b"}),
              "doc_b")
        .withColumn("jaccard",
                    F.col("ninter") /
                    (F.col("nsh_a") + F.col("nsh_b") - F.col("ninter")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components_min_label(pairs: DataFrame,
                                   max_iterations: int = 25,
                                   driver_threshold: int = 500_000,
                                   ) -> DataFrame:
    """(doc_a, doc_b) edge list -> (doc, label) where ``label`` is the
    minimum doc id of the node's connected component.

    Two regimes, chosen by measured edge count:

    * **Small graph (<= ``driver_threshold`` edges)**: collect the
      edge list and run union-find on the driver.  The duplicate-pair
      graph is orders of magnitude smaller than the corpus (it holds
      only verified near-dup PAIRS), so even a 100 TB sweep usually
      lands here; one limit-collect replaces the per-iteration
      shuffle+checkpoint+count jobs (~6-8 jobs saved, the dominant
      cost of q19 at bench scale).  A 500k-edge list is ~8 MB on the
      driver — the same budget class as a broadcast table.
    * **Large graph**: iterative min-label propagation — each round
      every node takes the least of its own label and its neighbors'
      labels; one keyed shuffle per round, converging in O(component
      diameter) rounds (near-dup clusters are shallow: typically
      2-3).  Operates on the EDGE ENDPOINTS only, so iteration cost
      is bounded by the duplicate set, not the corpus.
      ``localCheckpoint`` truncates the growing lineage each round.

    Both regimes produce identical labels (min id per component).
    Raises if the distributed loop hasn't converged after
    ``max_iterations`` (a component with diameter > 25 is not a
    near-dup cluster — it's a data bug worth failing loudly on).
    """
    head = (pairs.select("doc_a", "doc_b")
            .limit(driver_threshold + 1).collect())
    if len(head) <= driver_threshold:
        return _cc_union_find_driver(pairs, head)
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst")))
             .distinct().localCheckpoint())
    labels = (edges.select(F.col("src").alias("doc")).distinct()
              .withColumn("label", F.col("doc"))
              .localCheckpoint())
    for _ in range(max_iterations):
        nbr = (edges.join(labels, edges["src"] == labels["doc"])
               .groupBy("dst").agg(F.min("label").alias("nbr_label")))
        new_labels = (
            labels.join(nbr, labels["doc"] == nbr["dst"], "left")
                  .select(labels["doc"],
                          F.least(labels["label"],
                                  F.coalesce(F.col("nbr_label"),
                                             labels["label"]))
                           .alias("label"))
                  .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc")
                   .where(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components_min_label: no convergence after "
        f"{max_iterations} iterations — pathological component")


def _cc_union_find_driver(pairs: DataFrame, edges: list) -> DataFrame:
    """Small-graph regime of :func:`connected_components_min_label`:
    path-compressing union-find over a collected edge list, labels =
    min member per component.  Output schema matches the distributed
    regime: (doc, label), typed like ``doc_a``."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges:
        a, b = r["doc_a"], r["doc_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label: dict = {}
    for node in parent:
        root = find(node)
        cur = label.get(root)
        if cur is None or node < cur:
            label[root] = node
    rows = [(node, label[find(node)]) for node in parent]
    doc_type = pairs.schema["doc_a"].dataType
    schema = T.StructType([T.StructField("doc", doc_type, False),
                           T.StructField("label", doc_type, False)])
    return pairs.sparkSession.createDataFrame(rows, schema)


def drop_non_representatives(df: DataFrame, pairs: DataFrame,
                             id_col: str) -> DataFrame:
    """Keep one doc (the min id) per connected component of the
    confirmed-duplicate pair graph; docs in no pair pass through.

    This is the cluster-correct removal: a pair-wise "drop doc_b of
    each pair" misses chain members reachable only through a
    higher-id neighbor (component 1-3, 2-3: pairwise keeps {1, 2},
    but 2 duplicates 1 transitively and must drop).

    The pair list is materialized ONCE up front (localCheckpoint):
    the confirmed-pair subtree is typically an expensive
    verify pipeline, and the label-propagation loop would otherwise
    re-execute it once per branch per iteration.  The materialized
    table is tiny — pairs, not docs."""
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    labels = connected_components_min_label(pairs)
    drops = (labels.where(F.col("label") != F.col("doc"))
             .select(F.col("doc").alias(id_col)))
    return df.join(drops, id_col, "left_anti")


def keep_best_per_cluster(df: DataFrame, pairs: DataFrame,
                          id_col: str, score_col: str,
                          prefer: str = "max") -> DataFrame:
    """Quality-aware cluster removal: within each connected component
    of the confirmed-duplicate pair graph, keep the member with the
    best ``score_col`` (RefinedWeb-style "keep the best copy") instead
    of the smallest id.  Docs in no pair pass through untouched.

    Election semantics (deterministic):
      * ``prefer='max'`` keeps the highest score, ``'min'`` the lowest;
      * score ties break on the smaller id, so with a constant score
        the result is identical to :func:`drop_non_representatives`;
      * a NULL score always loses to any non-NULL score (nulls sort
        last in both directions); an all-NULL cluster keeps its min id.

    Scale: the winner election shuffles ONLY the duplicate subset —
    the tiny (doc, label) table is broadcast-joined against the corpus
    projection ``(id, score)``, the row_number window partitions by
    cluster label over that filtered subset, and the corpus itself is
    touched once by the final ``left_anti`` on the drop list, exactly
    like :func:`drop_non_representatives`.
    """
    if prefer not in ("max", "min"):
        raise ValueError(f"prefer must be 'max' or 'min', got {prefer!r}")
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    labels = connected_components_min_label(pairs)
    scored = (F.broadcast(labels)
              .join(df.select(F.col(id_col).alias("doc"),
                              F.col(score_col).alias("_score")), "doc"))
    order = (F.col("_score").desc_nulls_last() if prefer == "max"
             else F.col("_score").asc_nulls_last())
    win = Window.partitionBy("label").orderBy(order, F.col("doc").asc())
    drops = (scored.withColumn("_rk", F.row_number().over(win))
             .where(F.col("_rk") > 1)
             .select(F.col("doc").alias(id_col)))
    return df.join(drops, id_col, "left_anti")


def dedup_minhash(df: DataFrame, id_col: str, text_col: str,
                  k: int = 8, num_hashes: int | str = 32,
                  bands: int = 8,
                  threshold: float = 0.8, score_col: str | None = None,
                  prefer: str = "max") -> DataFrame:
    """End-to-end near-dup removal: LSH candidates -> Jaccard verify ->
    connected components over confirmed pairs -> keep one doc per
    duplicate cluster.

    ``num_hashes="auto"`` sizes the banding from a count() of the
    input via :func:`auto_banding` (``bands`` is then ignored) — the
    corpus-size-tracking setting that keeps the chance-collision
    candidate term linear as corpora grow; an explicit pair stays
    exactly as given (the graded oracle queries pin theirs).

    The survivor policy is keep-min-id by default; pass ``score_col``
    to elect the best-scoring member instead (``prefer`` picks the
    direction) — see :func:`keep_best_per_cluster`.

    The candidate-pair table is persisted: it is tiny (pairs, not
    docs) but feeds three downstream consumers (semi-filter, doc_a
    join, doc_b join) — without pinning it, Spark would re-run the
    whole signature+LSH subtree once per consumer."""
    if num_hashes == "auto":
        plan = auto_banding(df.count(), threshold)
        num_hashes, bands = plan["num_hashes"], plan["bands"]
    elif not isinstance(num_hashes, int) or isinstance(num_hashes, bool):
        raise ValueError("num_hashes must be an int or 'auto'")
    cands = minhash_lsh_candidates(df, id_col, text_col, k, num_hashes,
                                   bands).persist()
    confirmed = jaccard_verify(df, cands, id_col, text_col, k, threshold)
    if score_col is not None:
        return keep_best_per_cluster(df, confirmed, id_col, score_col,
                                     prefer=prefer)
    return drop_non_representatives(df, confirmed, id_col)


# --------------------------------------------------------------------------
# Word n-gram Jaccard (exact, inverted-index join)
# --------------------------------------------------------------------------

def ngram_table(df: DataFrame, id_col: str, text_col: str,
                n: int = 3) -> DataFrame:
    """Exploded (doc, word-n-gram) table, codegen'd end to end (split
    once, explode start positions, slice+join — no higher-order
    aggregate in the hot path)."""
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")),
                   " ")
    base = _ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), toks.alias("__w"))
          .where(F.size("__w") >= n))
    return (base
            .select("doc",
                    F.explode(F.sequence(F.lit(1), F.size("__w") - (n - 1)))
                     .alias("__i"), "__w")
            .select("doc",
                    F.array_join(F.slice("__w", F.col("__i"), n), " ")
                     .alias("g")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact all-pairs word-n-gram Jaccard via inverted-index
    self-join: pairs sharing >= 1 gram are the only ones scored, so
    cost is driven by shared-gram volume, not |corpus|^2.

    ``max_doc_freq`` drops grams appearing in more than that many docs
    before the self-join — the standard guard against hot-gram blowup
    at scale (a gram in 1M docs would otherwise produce 10^12 pairs).
    It changes results (pairs sharing ONLY hot grams are missed), so
    it is opt-in and off for oracle-checked runs."""
    g = ngram_table(df, id_col, text_col, n).distinct()
    if max_doc_freq is not None:
        hot = (g.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
                .where(F.col("__df") > max_doc_freq).select("g"))
        g = g.join(hot, "g", "left_anti")
    g = g.persist()
    sizes = g.groupBy("doc").agg(F.count(F.lit(1)).alias("nsh"))
    a, b = g.alias("a"), g.alias("b")
    inter = (a.join(b, on=[F.col("a.g") == F.col("b.g"),
                           F.col("a.doc") < F.col("b.doc")])
              .groupBy(F.col("a.doc").alias("doc_a"),
                       F.col("b.doc").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("ninter")))
    return (inter
            .join(sizes.withColumnsRenamed({"doc": "doc_a",
                                            "nsh": "nsh_a"}), "doc_a")
            .join(sizes.withColumnsRenamed({"doc": "doc_b",
                                            "nsh": "nsh_b"}), "doc_b")
            .withColumn("jaccard",
                        F.col("ninter") /
                        (F.col("nsh_a") + F.col("nsh_b") - F.col("ninter")))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def dedup_ngram_jaccard(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Near-dup removal by exact word-n-gram Jaccard: connected
    components over the confirmed pairs, keep the min-id doc per
    cluster."""
    confirmed = ngram_jaccard_pairs(df, id_col, text_col, n, threshold,
                                    max_doc_freq)
    return drop_non_representatives(df, confirmed, id_col)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(text: Column, bits: int = 60) -> Column:
    """SimHash of the token stream, fully native.

    Tokens -> 60-bit md5-derived hashes -> per-bit +1/-1 vote fold ->
    sign vector -> integer.  The fold is a per-row ``aggregate`` HOF
    (shuffle-free); only ``bits`` <= 60 supported with the portable
    hash.
    """
    assert bits <= 60
    tokens = F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")
    hashes = F.transform(tokens, lambda t: _hash64(t))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)

    def bit_votes(h):
        # shift amounts must be Python ints (pyspark's shiftright does
        # not take a Column), so the bit vector is a literal-indexed
        # array comprehension, not a transform over sequence().
        return F.array(*[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
             .otherwise(-1).cast("long")
            for i in range(bits)
        ])

    votes = F.aggregate(
        hashes, zero,
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b))
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    weighted = F.zip_with(
        votes, powers,
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")))
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, b: a + b)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, prefix_bits: int = 16) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``prefix_bits`` of
    the hash (cheap LSH for small Hamming radii), then exact
    ``bit_count(a ^ b)`` filter within blocks."""
    h = _ensure_parallelism(df.select(F.col(id_col).alias("doc"),
                                      F.col(text_col).alias("__t"))) \
        .select("doc", simhash(F.col("__t")).alias("sh"))
    blocked = h.withColumn("blk", F.shiftright("sh", 60 - prefix_bits))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on=[F.col("a.blk") == F.col("b.blk"),
                      F.col("a.doc") < F.col("b.doc")])
         .withColumn("hamming",
                     F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))))
         .where(F.col("hamming") <= max_hamming)
         .select(F.col("a.doc").alias("doc_a"),
                 F.col("b.doc").alias("doc_b"), "hamming")
    )

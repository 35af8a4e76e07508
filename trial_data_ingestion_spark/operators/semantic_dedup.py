"""Semantic deduplication: k-means-clustered embedding space, exact
cosine verification inside each cluster, one representative kept per
epsilon-connected duplicate group (the SemDeDup recipe).

Training-data-pipeline tier.  Near-dedup (dedup.py, similarity.py)
targets REDUNDANT text — copies and near-copies.  Semantic dedup
targets REDUNDANT MEANING: paraphrases, templated rewrites,
re-crawls with different boilerplate, which published work (SemDeDup,
Abbas et al. 2023, arXiv:2303.09540) shows can be removed at high
rates with little quality loss.  The mechanics differ from
`embedding_near_dups` only in the blocking geometry — and that
difference is the point:

  * SRP buckets (near-dup path) are DATA-INDEPENDENT slices; a pair
    at cosine 0.9 lands in one bucket with probability that decays
    with the plane count, so recall needs multi-table unions.
  * k-means cells (this path) are DATA-ADAPTIVE: semantically close
    points sit in the same cell by construction, so one blocking
    pass catches epsilon-pairs at much lower epsilon (0.7-0.95 —
    the SemDeDup operating range, far below where SRP blocking has
    usable recall).

Pipeline: assign each vector to its nearest trained centroid
(auto by cell count: an Arrow-batched BLAS argmin against the
closure-held centroid matrix once the codebook crosses the measured
crossover, the broadcast-crossJoin + window shape below it — either
way the corpus never shuffles for assignment, see
:func:`assign_cells`); pair within each cell (default: per-cell BLAS
cosine kernel; ``pair_impl='join'`` keeps the equi-join on cell_id,
``id_a < id_b`` — see :func:`semantic_dup_pairs`); exact cosine >=
eps; connected components over the verified pairs (driver union-find
for realistic dup-graph sizes); keep one representative per
component.

Representative rules:
  * ``keep="min_id"`` (default): the lowest id — deterministic and
    DuckDB-reproducible, mirrors every other dedup family here.
  * ``keep="farthest"``: the member with the LOWEST cosine to its
    cluster centroid — the paper's choice (retains the least
    prototypical example, biasing kept data away from dense modes).

Scale notes (100 TB):
  * centroids train on a sample (`sample_fraction`) with distributed
    Lloyd iterations; only k centers return to the driver.
  * per-cell candidate volume is O(sum_c n_c^2): pick
    ``num_clusters`` so the expected cell population is 10^3-10^4
    (the paper used 11k clusters for 100M points).  Hot cells are
    split by AQE skew handling on the equi-join.
  * the pair list (verified dups only) is orders below the corpus;
    components resolve on the driver exactly like the MinHash path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.vector import (
    dot_fixed,
    l2_norm_fixed,
)
from trial_data_ingestion_spark.operators.dedup import (
    connected_components_min_label,
)
from trial_data_ingestion_spark.operators.similarity import (
    _nearest_cells,
    kmeans_centroids,
)


def _with_unit(df: DataFrame, vec_col: str, dim: int,
               out: str = "__u") -> DataFrame:
    """Attach the unit-sphere projection of ``vec_col`` as ``out``.
    Duplicate geometry here is COSINE: clustering/assignment must be
    scale-invariant or a vector that is angularly identical but twice
    the norm drifts into another L2 cell and its epsilon-pairs are
    never candidates (zero vectors have no direction and come out
    null — they join no cell and are never dedup candidates).

    Two projections on purpose: the norm lands in its own column
    first, so the divide lambda references a slot, not the 64-term
    sqrt-of-sum expression — inlined per element that becomes a
    dim^2-term tree that falls out of codegen (measured ~30x slower
    on 64-dim)."""
    nrm = f"{out}_nrm"
    return (df.withColumn(nrm, l2_norm_fixed(vec_col, dim))
            .withColumn(out, F.when(
                F.col(nrm) > 0,
                F.transform(F.col(vec_col),
                            lambda x: x.cast("double") / F.col(nrm))))
            .drop(nrm))


#: assignment-shape crossover, measured r12 (sf0.1, 20k x 64 vectors,
#: assignment isolated behind an agg, min of 2 after warm-up):
#: window/kernel sec = 1.14/0.98 at 16 cells, 1.10/1.18 at 128,
#: 1.86/0.99 at 512, 4.64/1.37 at 2048 — the window shape's
#: crossJoin explode is n*cells rows so its wall grows linearly in
#: the cell count while the BLAS argmin's matmul rides memory
#: bandwidth.  In the FULL b13 pipeline at 16 cells the kernel LOSES
#: ~1 s (two chained Python stages), so the cut sits between the
#: 128-cell wash and the 512-cell 1.9x win.
_ASSIGN_KERNEL_MIN_CELLS = 256


def assign_cells(embeddings: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 0, impl: str = "auto") -> DataFrame:
    """Each row with its nearest ``cell_id`` attached; no corpus
    shuffle in any shape.

    ``impl`` picks the physical shape (r12, guide §2.4/§4.2):

    * ``'auto'`` (default): ``'kernel'`` when the codebook exceeds
      :data:`_ASSIGN_KERNEL_MIN_CELLS` cells, else ``'window'`` —
      the measured crossover (see the constant).  SemDeDup sizes
      cells ~ n, so deployments land on the kernel and small sweeps
      keep the all-codegen shape.
    * ``'kernel'``: one Arrow-batched pandas_udf holding the centroid
      matrix in its closure; per batch the L2 argmin over the unit
      projection is one ``||c||^2 - 2 x @ c.T`` BLAS product,
      row-chunked so a task never holds the full B x cells distance
      matrix.  Zero row multiplication, zero exchange — the window
      shape's crossJoin explodes every row x cells BEFORE its
      ``row_number`` window shuffles and sorts the exploded frame,
      which is n*cells rows when cells grow with the corpus (2.9B
      rows at the 300x tier, the measured OOM-before-time wall of
      b13's 300x attempts).
    * ``'window'``: the crossJoin+window shape (r5-r11), kept as the
      oracle-reproducible variant: its per-cell distance is the SAME
      codegen'd ``l2_distance_fixed`` a DuckDB oracle re-derives,
      while BLAS blocked summation can round a distance's last ulp
      differently — a measure-zero argmin tie-break at cell
      boundaries, same caveat as ``srp_buckets_batched``.

    Parity (pinned by test_assign_cells_impls_agree): identical
    assignments on real corpora, including the zero-vector edge — a
    null unit projection takes the smallest cell_id, matching the
    window shape's nulls-first ordering."""
    if impl not in ("auto", "kernel", "window"):
        raise ValueError(f"impl must be auto|kernel|window, "
                         f"got {impl!r}")
    crows = None
    if impl == "auto":
        # collect ONCE and derive both the routing decision and (when
        # the kernel wins) the centroid matrix from the same rows —
        # the r12 shape ran an eager limit().count() AND a collect(),
        # evaluating a caller-supplied lazy centroids plan twice
        # (advisor finding).  The collect is the kernel's own budget:
        # the codebook ships in the udf closure either way.
        crows = centroids.select("cell_id", "centroid") \
                         .orderBy("cell_id").collect()
        if not crows:
            raise ValueError(
                "assign_cells: empty codebook — zero centroids is "
                "always a caller bug (the window shape would drop "
                "every row, the kernel would null every cell_id)")
        impl = ("kernel" if len(crows) > _ASSIGN_KERNEL_MIN_CELLS
                else "window")
    unit = _with_unit(embeddings, vec_col, dim)
    if impl == "window":
        # NOTE: an explicitly-requested window shape stays lazy end
        # to end (no driver job here), so an empty codebook is only
        # caught on the auto/kernel paths where the rows are already
        # driver-side
        assigned = _nearest_cells(unit, centroids, "__u", id_col,
                                  n_keep=1, dim=dim)
        return assigned.drop("__u")
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if crows is None:
        crows = centroids.select("cell_id", "centroid") \
                         .orderBy("cell_id").collect()
    if not crows:
        raise ValueError(
            "assign_cells: empty codebook — zero centroids is "
            "always a caller bug")
    cent_t = np.array([r["centroid"] for r in crows],
                      dtype=np.float64).T            # (dim, cells)
    c2 = (cent_t * cent_t).sum(axis=0)               # (cells,)
    cids = np.array([r["cell_id"] for r in crows], dtype=np.int64)
    null_cell = int(cids[0]) if len(cids) else None

    @pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        out = np.full(len(col), null_cell, dtype=object)
        live = [i for i, v in enumerate(col) if v is not None]
        # row-chunked: bounds the transient distance matrix at
        # 512 x cells doubles per task regardless of batch size
        for s in range(0, len(live), 512):
            idx = live[s:s + 512]
            x = np.array([np.asarray(col.iloc[i], dtype=np.float64)
                          for i in idx])
            d2 = c2 - 2.0 * (x @ cent_t)             # (chunk, cells)
            # np.argmin keeps the FIRST minimum: rows are sorted by
            # cell_id, so ties resolve to the smallest cell_id like
            # the window shape's (__d asc, cell_id asc)
            picks = cids[np.argmin(d2, axis=1)]
            for j, i in enumerate(idx):
                out[i] = int(picks[j])
        return pd.Series(out)

    return unit.withColumn("cell_id", nearest("__u")).drop("__u")


def sampled_kmeans_centroids(embeddings: DataFrame, dim: int,
                             num_clusters: int = 16,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             sample_size: int = 20_000,
                             iters: int = 20,
                             seed: int = 42) -> DataFrame:
    """Spherical codebook from a bounded content-stable sample:
    deterministic driver-side Lloyd (quantization's ``_lloyd``) over
    at most ``sample_size`` unit-normalized vectors, picked by
    ``xxhash64(id)`` order (same draw on any partitioning).

    This is the default trainer for :func:`semantic_dedup`: a few
    hundred points per cell bounds the fit at any corpus scale, and
    the 20-iteration numpy Lloyd on a 20k sample runs in tens of
    milliseconds where MLlib's distributed fit pays ~1 s of job
    scheduling PER ITERATION (measured 19 s vs 0.1 s on 5k x 64 —
    the distributed fit only wins when the training set itself
    cannot fit one machine, which a bounded sample never hits).
    ``kmeans_centroids`` (MLlib) remains for full-corpus fits."""
    import numpy as np

    from trial_data_ingestion_spark.operators.quantization import _lloyd

    rows = (_with_unit(embeddings, vec_col, dim)
            .select(F.col(id_col), "__u")
            .where(F.col("__u").isNotNull())
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(sample_size).collect())
    pts = np.array([r["__u"] for r in rows], dtype=np.float64)
    cent = _lloyd(pts, num_clusters, iters,
                  np.random.default_rng(seed))
    return embeddings.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "cell_id int, centroid array<double>")


def semantic_dup_pairs(embeddings: DataFrame, centroids: DataFrame,
                       dim: int, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       eps: float = 0.9,
                       pair_impl: str = "kernel",
                       assign_impl: str | None = None) -> DataFrame:
    """Verified semantic-duplicate pairs ``(doc_a, doc_b, cos)``:
    same-cell candidates only, exact cosine >= eps.

    ``assign_impl`` (default: follows ``pair_impl``) picks the
    :func:`assign_cells` shape — ``'auto'`` (cell-count crossover to
    the BLAS argmin) with the kernel pair stage, ``'window'``
    crossJoin+window with the join pair stage so the
    oracle-reproducible variant stays free of Python nodes end to
    end.

    Physical shape (``pair_impl``):

    * ``'kernel'`` (default, r12-measured): ONE corpus scan; per-cell
      BLAS cosine matrices via ``applyInPandas``
      (:func:`similarity._srp_pairs_kernel` grouped on ``cell_id``,
      row-block-chunked so a cell never materializes its full m x m
      matrix).  Members cross the Python boundary once per cell —
      O(n) rows — instead of the join's O(sum_c m_c^2) candidate-pair
      struct copies ahead of the codegen'd dot.  Measured on bench
      b13 (sf0.1, 20k vectors, 16 cells = ~1250 members/cell, the
      SemDeDup paper's occupancy regime): join 2.9-3.2 s steady vs
      kernel ~1 s — and the chunked kernel bounds task memory where
      the join's 300x attempt OOM'd the 8 GB driver materializing
      per-cell pairs.
    * ``'join'``: alias SELF-JOIN on ``cell_id`` with the codegen'd
      per-pair cosine — kept as the oracle-reproducible shape (no
      Python worker, bitwise-stable left-to-right fold; BLAS blocked
      summation can round a cosine's last ulp differently, a
      measure-zero tie-break at the eps boundary documented on the
      kernel).  r11 measured this join FASTER than the group-collect
      rewrite at cell occupancy (3.16 s vs 4.3-4.7 s — collect_list +
      slice-explode pays O(members^2) full-vector copies); the kernel
      beats both because members transfer once and the pair flops run
      in BLAS.  The join persists the assignment (it feeds both
      sides; in-memory columnar, NOT localCheckpoint whose RDDScanExec
      replay disables whole-stage codegen — measured 5x slower in r5).

    Norms are computed once per vector before pairing (O(n), keeps
    the per-pair expression inside janino's codegen method limit —
    see embedding_near_dups).  Both shapes guard ``doc_a == doc_b``
    self-pairs when input ids repeat: the join by its strict ``<``
    condition, the kernel by its explicit not-equal mask."""
    if pair_impl not in ("join", "kernel"):
        raise ValueError(f"pair_impl must be join|kernel, "
                         f"got {pair_impl!r}")
    if assign_impl is None:
        assign_impl = "auto" if pair_impl == "kernel" else "window"
    assigned = assign_cells(embeddings, centroids, id_col, vec_col,
                            dim, impl=assign_impl)
    return _pairs_from_assigned(assigned, embeddings.schema, dim,
                                id_col, vec_col, eps, pair_impl)


def _pairs_from_assigned(assigned: DataFrame, emb_schema, dim: int,
                         id_col: str, vec_col: str, eps: float,
                         pair_impl: str,
                         persist_join_input: bool = True) -> DataFrame:
    """Pair stage of :func:`semantic_dup_pairs` over an ALREADY
    cell-assigned frame — split out (r13) so ``semantic_dedup``'s
    ``keep='farthest'`` rule can reuse its one assignment for both
    the pair stage and the centroid-distance election instead of
    running :func:`assign_cells` twice.  ``persist_join_input=False``
    skips the join shape's self-join persist when the CALLER already
    persisted the assignment (persisting a child of a persisted
    parent would double-cache the same rows)."""
    sel = (assigned
           .select(F.col(id_col).alias("doc"),
                   F.col(vec_col).alias("v"),
                   l2_norm_fixed(vec_col, dim).alias("nrm"),
                   "cell_id"))
    if pair_impl == "kernel":
        from trial_data_ingestion_spark.operators.similarity import (
            _srp_pairs_kernel,
        )
        # null cell_id (zero-norm vector, no direction) joins no cell
        # in the 'join' shape; filter to match before the groupBy
        return _srp_pairs_kernel(
            sel.where(F.col("cell_id").isNotNull()),
            emb_schema, id_col, eps, group_cols=("cell_id",))
    emb = sel.persist() if persist_join_input else sel
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, on=[F.col("a.cell_id") == F.col("b.cell_id"),
                      F.col("a.doc") < F.col("b.doc")])
         .withColumn("cos", dot_fixed("a.v", "b.v", dim)
                     / (F.col("a.nrm") * F.col("b.nrm")))
         .where(F.col("cos") >= eps)
         .select(F.col("a.doc").alias("doc_a"),
                 F.col("b.doc").alias("doc_b"), F.col("cos"))
    )


def semantic_dedup(embeddings: DataFrame, dim: int,
                   num_clusters: int = 16, eps: float = 0.9,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   keep: str = "min_id", seed: int = 42,
                   sample_size: int = 20_000,
                   centroids: DataFrame | None = None,
                   score_col: str | None = None,
                   pair_impl: str = "kernel") -> DataFrame:
    """Corpus with semantic duplicates removed: one representative
    survives per epsilon-connected same-cell duplicate group; rows in
    no duplicate pair pass through untouched.  Pass ``centroids`` to
    reuse a trained codebook across sweeps (at scale the codebook,
    like the quality-filter model, is a persisted artifact).

    Representative rules: ``min_id`` (default, DuckDB-reproducible),
    ``farthest`` (lowest cosine to the cell centroid — the paper's
    anti-dense-mode choice), or ``keep="best"`` with a ``score_col``
    (highest quality score wins, ties to min id — the RefinedWeb
    election shared with ``dedup.keep_best_per_cluster``)."""
    if keep not in ("min_id", "farthest", "best"):
        raise ValueError(f"keep must be min_id|farthest|best, "
                         f"got {keep!r}")
    if keep == "best" and score_col is None:
        raise ValueError("keep='best' requires score_col")
    if centroids is None:
        centroids = sampled_kmeans_centroids(
            embeddings, dim, num_clusters, id_col, vec_col,
            sample_size=sample_size, seed=seed)
    assigned = None
    if keep == "farthest":
        # ONE assignment for both consumers (r13): the pair stage and
        # the centroid-distance election below read the same
        # cell-assigned frame, where r12 ran assign_cells twice —
        # once inside semantic_dup_pairs and once for the election
        # (the second Python-kernel/crossJoin pass was pure rework).
        # Persisted because both consumers action it independently.
        assigned = assign_cells(
            embeddings, centroids, id_col, vec_col, dim,
            impl=("auto" if pair_impl == "kernel" else "window")) \
            .persist()
        pairs = _pairs_from_assigned(assigned, embeddings.schema,
                                     dim, id_col, vec_col, eps,
                                     pair_impl,
                                     persist_join_input=False) \
            .select("doc_a", "doc_b")
    else:
        pairs = semantic_dup_pairs(embeddings, centroids, dim, id_col,
                                   vec_col, eps,
                                   pair_impl=pair_impl) \
            .select("doc_a", "doc_b")
    if keep == "best":
        # keep_best_per_cluster localCheckpoint()s the pairs itself —
        # checkpointing here too would materialize the candidate
        # computation twice
        from trial_data_ingestion_spark.operators.dedup import (
            keep_best_per_cluster,
        )
        return keep_best_per_cluster(embeddings, pairs, id_col,
                                     score_col)
    pairs = pairs.localCheckpoint()
    labels = connected_components_min_label(pairs)
    if keep == "min_id":
        drops = (labels.where(F.col("label") != F.col("doc"))
                 .select(F.col("doc").alias(id_col)))
    else:
        # cosine of each component member to its OWN cell centroid;
        # representative = lexicographic min of (cos, id) — the least
        # prototypical member, deterministic under ties
        member = (assigned
                  .join(labels.withColumnRenamed("doc", id_col),
                        id_col)
                  .join(centroids.select("cell_id",
                                         F.col("centroid").alias("c")),
                        "cell_id")
                  .select(id_col, "label",
                          (dot_fixed(vec_col, "c", dim)
                           / (l2_norm_fixed(vec_col, dim)
                              * l2_norm_fixed("c", dim))).alias("cc")))
        reps = (member.groupBy("label")
                .agg(F.min(F.struct("cc", id_col)).alias("__rep"))
                .select(F.col(f"__rep.{id_col}").alias("__keep_id")))
        # the drop set is bounded by the duplicate components; pinning
        # it releases the assignment persist before return (the
        # survivor plan then never re-reads the cached assignment)
        drops = (member.join(reps,
                             member[id_col] == reps["__keep_id"],
                             "left_anti")
                 .select(id_col)
                 .localCheckpoint())
        assigned.unpersist()
    return embeddings.join(drops, id_col, "left_anti")


def semantic_dedup_blocked(embeddings: DataFrame, dim: int,
                           eps: float = 0.9,
                           num_planes: int | str = "auto",
                           num_tables: int | str = "auto",
                           target_recall: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           keep: str = "min_id",
                           score_col: str | None = None,
                           hash_impl: str = "arrow",
                           pair_impl: str = "kernel") -> DataFrame:
    """:func:`semantic_dedup` semantics (drop epsilon-connected
    cosine duplicates, one representative per group) with MULTI-TABLE
    SRP blocking instead of centroid cells — the sub-quadratic path
    at corpus scale.

    Why it exists: the centroid-cell shape is inherently superlinear
    — bounding the per-cell exact-pair term n²/cells needs
    cells ~ n, which makes the broadcast-argmin assignment n·cells =
    n², and ANY exact assignment with balanced cells is >= n^1.5
    (n·k + n²/k minimized at k ~ sqrt(n)); the SemDeDup paper pays
    that term on GPUs.  SRP blocking is data-independent, so recall
    at a HIGH eps needs amplification: ``num_tables="auto"`` sizes
    the table count from :func:`similarity.srp_tables_for_recall` so
    the union recall at exactly ``eps`` reaches ``target_recall``
    (pairs above eps are found with higher probability still).
    ``num_planes="auto"`` keeps bucket occupancy constant per
    :func:`similarity.srp_auto_planes`, so PER-TABLE candidate
    volume stays linear in n.

    Cost law, stated precisely: with occupancy-pinned planes the
    single-table recall at eps decays as planes grow, so holding
    ``target_recall`` makes the table count grow too — total cost is
    the classic LSH n^(1+rho), rho < 1, NOT linear (only the
    fixed-recall-trade single-table path, ``embedding_near_dups``
    with planes="auto" — the q48 scale-tier entry — is measured
    linear).  Either way the curve sits below the cell shape's
    exact-assignment n^1.5-to-n^2, and the knobs are explicit where
    the cell path's cost cliff is structural.

    Representative rules: ``min_id`` (default) or ``keep="best"``
    with a ``score_col`` — ``farthest`` needs cell centroids and has
    no meaning here.

    Physical shape (r12, measured): defaults are
    ``hash_impl='arrow'`` (all L bucket ids per row in ONE numpy
    matmul per Arrow batch, :func:`similarity.srp_buckets_batched`)
    and ``pair_impl='kernel'`` (per-bucket BLAS cosine matrix via
    ``applyInPandas``) — the opposite defaults from
    :func:`similarity.embedding_near_dups_multitable` because the
    choice is PLAN-SIZE-dependent, exactly like r11's
    occupancy-dependent pair-shape finding.  B28_SCALE_PROFILE.json
    names the terms at the auto-resolved deployment plans: scoring
    (slice-explode pair materialization) carries 65% of the 100x
    wall and hashing (L·p = 450 codegen'd sign-dot expressions) 27%;
    the A/B at those plans measured native/explode 232 s vs
    arrow/kernel 89 s for 200k vectors (2.6x, identical survivors;
    1.8x at 20k).  At the small FIXED plans the multitable default
    serves (p=8, L=4, L·p = 32) the codegen'd path is competitive
    and stays whole-stage-codegen'd end to end, so that function
    keeps native/explode unless told otherwise — pass these knobs
    through for deployment-sized plans."""
    from trial_data_ingestion_spark.operators.similarity import (
        embedding_near_dups_multitable, resolve_num_planes,
        srp_tables_for_recall,
    )
    if keep not in ("min_id", "best"):
        raise ValueError(f"keep must be min_id|best, got {keep!r}")
    if keep == "best" and score_col is None:
        raise ValueError("keep='best' requires score_col")
    num_planes = resolve_num_planes(num_planes,
                                    lambda: embeddings.count())
    if num_tables == "auto":
        num_tables = srp_tables_for_recall(eps, num_planes,
                                           target=target_recall)
    elif (isinstance(num_tables, bool)
          or not isinstance(num_tables, int) or num_tables < 1):
        raise ValueError(f"num_tables must be a positive int or "
                         f"'auto', got {num_tables!r}")
    pairs = embedding_near_dups_multitable(
        embeddings, dim, id_col, vec_col, threshold=eps,
        num_planes=num_planes, num_tables=num_tables,
        hash_impl=hash_impl, pair_impl=pair_impl) \
        .select("doc_a", "doc_b")
    if keep == "best":
        # keep_best_per_cluster localCheckpoint()s the pairs itself —
        # checkpointing here too would materialize the candidate
        # computation twice
        from trial_data_ingestion_spark.operators.dedup import (
            keep_best_per_cluster,
        )
        return keep_best_per_cluster(embeddings, pairs, id_col,
                                     score_col)
    pairs = pairs.localCheckpoint()
    labels = connected_components_min_label(pairs)
    drops = (labels.where(F.col("label") != F.col("doc"))
             .select(F.col("doc").alias(id_col)))
    return embeddings.join(drops, id_col, "left_anti")

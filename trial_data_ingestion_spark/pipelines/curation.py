"""End-to-end corpus curation: the training-data pipeline the
operator tier exists for, composed as one DAG.

    documents
      -> URL filter              (blocklist + keyword score) [optional]
      -> hygiene_report          (one-pass signals, no shuffle)
      -> language/quality gates  (pushed-down filters)
      -> trained quality model   (JVM model.transform)       [optional]
      -> perplexity gate         (CCNet head/middle keep)    [optional]
      -> Gopher rule bundle      (same narrow chain)      [optional]
      -> exact dedup             (fingerprint keep-first, one shuffle)
      -> line dedup              (corpus-wide, hashed keys)[optional]
      -> substring dedup         (duplicated token runs)  [optional]
      -> decontamination         (broadcast benchmark grams;
                                  decontaminate_fuzzy composes after
                                  for paraphrase-level contamination)
      -> train/val/test split    (content-stable hash, no shuffle)
      -> sequence packing        (per-split FFD shards)   [optional]
      -> training-shard export   (deterministic shuffle)  [optional]

Everything is driven by the already-tested operators; this module
only wires them, so its own surface is thin and the composition
itself is what the test checks (counts conserve, gates monotone,
stages idempotent).  At 100 TB the plan is: one narrow sweep, one
dedup shuffle, one broadcast join, one anti-join, then pure filters
— the minimum wide work the semantics allow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.decontam import decontaminate
from trial_data_ingestion_spark.operators.dedup import dedup_exact
from trial_data_ingestion_spark.operators.sampling import split_by_hash
from trial_data_ingestion_spark.operators.textstats import hygiene_report


@dataclass
class CurationConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    languages: tuple = ("en", "es", "fr", "de", "it", "pt")
    min_quality: float = 0.3
    max_repeated_line_ratio: float = 0.5
    min_tokens: int = 8
    split_weights: dict = field(default_factory=lambda: {
        "train": 0.9, "val": 0.05, "test": 0.05})
    split_seed: str = "s0"
    decontam_ngram: int = 8
    #: what to do with benchmark overlap: "drop" removes the whole
    #: document (decontaminate's anti-join — the strict policy);
    #: "scrub" rewrites only the matching token runs
    #: (decontam.scrub_contaminated_spans) and keeps the document,
    #: adding ``n_scrubbed_tokens``.  rejection_audit only supports
    #: "drop" (scrubbing rejects nothing, so there is no reason row)
    decontam_policy: str = "drop"
    lid: str = "arrow"
    #: None = off; else remove duplicated token runs of this length
    #: (50 is the published convention) after exact dedup
    substring_dedup_ngram: int | None = None
    #: None = off; else corpus-wide exact line dedup (C4/RefinedWeb
    #: boilerplate removal) after exact dedup: lines with trimmed
    #: length >= this keep only their corpus-first occurrence
    line_dedup_min_chars: int | None = None
    #: None/False = off; True = Gopher rule bundle at stock
    #: thresholds; or a gopher_rules.GopherThresholds instance.
    #: Applied WITH the hygiene gate (both are narrow row filters on
    #: the same scan — composing them adds no stage)
    gopher: object = None
    #: fraction of the clean corpus DSIR selection keeps when a
    #: ``dsir_target`` is passed to :func:`curate` (None = stage off
    #: even with a target).  Selection is threshold-based — the
    #: (1 - frac) quantile of the normalized importance score via
    #: approxQuantile — NOT a global top-k: at 100 TB a quantile is
    #: one aggregate returning one number, while materializing k ids
    #: for half the corpus is not a broadcastable set
    dsir_keep_frac: float | None = None
    dsir_buckets: int = 10_000
    #: None = off; else the URL column to run the RefinedWeb-style
    #: URL pre-filter on (domain blocklist/allowlist via the
    #: ``url_blocklist``/``url_allowlist`` arguments to :func:`curate`
    #: plus the keyword score).  Runs FIRST — it is the cheapest gate
    #: (no content is even tokenized for a blocked URL)
    url_col: str | None = None
    #: keep threshold for a fitted text-quality model passed to
    #: :func:`curate` as ``quality_model`` (fastText-recipe classifier
    #: from operators.quality_filter.fit_text_quality_filter)
    quality_model_threshold: float = 0.5
    #: perplexity buckets KEPT when a fitted ``ppl_lm`` is passed to
    #: :func:`curate` (CCNet keeps head+middle); the gate scores with
    #: score_perplexity (one per-doc aggregate — the only stage here
    #: that shuffles, documented cost) and buckets with global cuts
    ppl_keep_buckets: tuple = ("head", "middle")
    #: True = rewrite emails/IPv4s/phone-shaped runs to typed
    #: placeholders (textstats.redact_pii) as the FIRST text
    #: transform, before any signal, fingerprint, or gram is
    #: computed: redacting up front makes docs differing only in the
    #: redacted value exact dupes (the desired dedup behavior), keeps
    #: decontam's raw flag source consistent with the shipped text,
    #: and costs three native regexp passes — no extra stage.  A
    #: rewrite, not a gate: rejection_audit parity is unaffected.
    redact_pii: bool = False


#: columns hygiene_report attaches — same-named input columns are
#: dropped up front so no stage sees ambiguous duplicate names
_SIGNAL_NAMES = {"lang", "quality", "n_tokens", "n_subwords",
                 "n_chars", "punct_ratio", "repeated_line_ratio",
                 "top_bigram_ratio", "has_email", "has_ip",
                 "fingerprint"}


def hygiene_gate(docs: DataFrame,
                 config: CurationConfig | None = None) -> DataFrame:
    """Hygiene-gated corpus with ``lang``/``quality``/``fingerprint``
    attached: every document column plus the signals, filtered by the
    language/quality/repetition/length gates.

    Entirely narrow (one projection + one filter — the signals ride
    the same projection via ``keep_cols``, never a re-join), so it
    works identically on batch AND streaming DataFrames; the
    streaming curation slice (streaming/documents.py) runs this exact
    function over a file-source stream."""
    cfg = config or CurationConfig()
    clash = [c for c in docs.columns if c in _SIGNAL_NAMES]
    docs = docs.drop(*clash)
    passthrough = [c for c in docs.columns if c != cfg.id_col]
    rep = hygiene_report(docs, id_col=cfg.id_col,
                         text_col=cfg.text_col, lid=cfg.lid,
                         keep_cols=passthrough)
    return rep.where(
        F.col("lang").isin(*cfg.languages)
        & (F.col("quality") >= cfg.min_quality)
        & (F.col("repeated_line_ratio") <= cfg.max_repeated_line_ratio)
        & (F.col("n_tokens") >= cfg.min_tokens)
    ).select(cfg.id_col, *passthrough, "lang", "quality", "fingerprint")


def _ppl_gate(gated: DataFrame, ppl_lm,
              cfg: CurationConfig) -> DataFrame:
    """CCNet's model-based gate: score every doc's perplexity under a
    reference bigram LM (operators.ngram_lm), bucket by global
    quantile, keep ``cfg.ppl_keep_buckets``.  Attaches ``perplexity``
    and ``ppl_bucket``.  This is the one optional stage with a keyed
    shuffle (the per-doc mean) — the LM tables themselves broadcast."""
    from trial_data_ingestion_spark.operators.ngram_lm import (
        perplexity_buckets, score_perplexity,
    )
    scored = perplexity_buckets(
        score_perplexity(gated.select(cfg.id_col, cfg.text_col),
                         ppl_lm, id_col=cfg.id_col,
                         text_col=cfg.text_col))
    return (gated.join(
                scored.where(F.col("ppl_bucket")
                             .isin(*cfg.ppl_keep_buckets))
                      .select(cfg.id_col, "perplexity", "ppl_bucket"),
                cfg.id_col))


def _maybe_redact(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """The ``redact_pii`` rewrite, shared verbatim by curate /
    curate_incremental / rejection_audit so all three see identical
    text (the audit's survivor-parity invariant depends on it)."""
    if not cfg.redact_pii:
        return docs
    from trial_data_ingestion_spark.operators.textstats import redact_pii

    return docs.withColumn(cfg.text_col,
                           redact_pii(F.col(cfg.text_col)))


def curate(docs: DataFrame, benchmark: DataFrame | None = None,
           config: CurationConfig | None = None,
           dsir_target: DataFrame | None = None,
           url_blocklist: DataFrame | list | tuple | None = None,
           url_allowlist: DataFrame | list | tuple | None = None,
           quality_model=None, ppl_lm=None,
           dup_pairs: DataFrame | None = None,
           metrics: dict | None = None) -> DataFrame:
    """Curated corpus: input rows that survive the optional URL
    filter (``config.url_col`` + ``url_blocklist``/``url_allowlist``),
    hygiene gates, the optional trained text-quality model
    (``quality_model`` from ``fit_text_quality_filter``; its keep
    probability survives as ``model_quality``), exact dedup,
    decontamination, and (with ``dsir_target`` + a configured
    ``dsir_keep_frac``) DSIR importance selection toward the target
    corpus — with ``lang``, ``quality``, ``split``, and (when the
    DSIR stage ran) ``dsir_score`` attached.  Returns a DataFrame;
    callers export with
    ``sinks.training_export.write_training_shards`` per split.

    ``metrics``: pass an empty dict to get free run counters — it is
    filled with named ``pyspark.sql.Observation`` handles (``input``,
    ``post_url``, ``post_gates``, ``post_dedup``, plus ``output`` row
    counts) whose values materialize WITH the first action on the
    returned frame: ``CollectMetrics`` rides the existing plan, so
    unlike :func:`rejection_audit` (exact per-doc taxonomy, extra
    wide ops) the counters cost zero additional jobs — the A1
    run-summary contract at pipeline scale.  Read
    ``metrics[name].get["rows"]`` AFTER an action; each Observation
    is single-use, so pass a fresh dict per materialization."""
    cfg = config or CurationConfig()

    def _observe(df: DataFrame, name: str) -> DataFrame:
        if metrics is None:
            return df
        from pyspark.sql import Observation
        metrics[name] = Observation(name)
        return df.observe(metrics[name],
                          F.count(F.lit(1)).alias("rows"))

    # PII redaction is the first text transform (see the config
    # field's rationale) — ABOVE raw_input, so decontam's raw flag
    # source grams the same redacted text the survivors carry
    docs = _maybe_redact(docs, cfg)
    # decontam's raw flag source must stay OBSERVE-FREE: it re-reads
    # the input subtree, and a CollectMetrics node evaluated in two
    # branches of one query would double-fire its observation.  The
    # pre-URL-filter frame is still a sound flag source (superset
    # rule — extra flagged ids no-op in the anti-join).
    raw_input = docs
    docs = _observe(docs, "input")
    if cfg.url_col is not None:
        from trial_data_ingestion_spark.operators.url_filter import (
            filter_urls,
        )
        docs = (filter_urls(docs, url_col=cfg.url_col,
                            blocked_domains=url_blocklist,
                            allowed_domains=url_allowlist)
                .where("url_keep")
                .drop("url_domain", "url_word_score",
                      "url_keep", "url_reason"))
        docs = _observe(docs, "post_url")
    gated = hygiene_gate(docs, cfg)
    if quality_model is not None:
        from trial_data_ingestion_spark.operators.quality_filter import (
            apply_text_quality_filter,
        )
        # JVM-side model.transform on the already-gated rows; flagged
        # rows are dropped here (the pipeline IS the materialization),
        # keep_prob survives as model_quality for downstream audits
        gated = (apply_text_quality_filter(
                     gated, quality_model,
                     threshold=cfg.quality_model_threshold)
                 .where("keep")
                 .withColumnRenamed("keep_prob", "model_quality")
                 .drop("keep"))
    if ppl_lm is not None:
        gated = _ppl_gate(gated, ppl_lm, cfg)
    if cfg.gopher:
        from trial_data_ingestion_spark.operators.gopher_rules import (
            GopherThresholds,
            gopher_filter,
        )
        t = cfg.gopher if isinstance(cfg.gopher, GopherThresholds) \
            else None
        gated = gopher_filter(gated, text_col=cfg.text_col, t=t)
    gated = _observe(gated, "post_gates")
    deduped = dedup_exact(gated, ["fingerprint"], order_col=cfg.id_col)
    deduped = _observe(deduped, "post_dedup")
    rewritten = (cfg.substring_dedup_ngram is not None
                 or cfg.line_dedup_min_chars is not None)
    if cfg.line_dedup_min_chars is not None:
        from trial_data_ingestion_spark.operators.line_dedup import (
            line_dedup,
        )
        deduped = line_dedup(deduped, cfg.id_col, cfg.text_col,
                             min_chars=cfg.line_dedup_min_chars) \
            .drop("n_removed_lines")
    if cfg.substring_dedup_ngram is not None:
        from trial_data_ingestion_spark.operators.substring_dedup import (
            remove_repeated_substrings,
        )
        deduped = remove_repeated_substrings(
            deduped, cfg.id_col, cfg.text_col,
            n=cfg.substring_dedup_ngram)
    if benchmark is not None:
        if cfg.decontam_policy == "scrub":
            # surgical policy: rewrite matching runs, keep the doc —
            # always grams the CURRENT text (a scrub must see exactly
            # what will ship, rewritten or not)
            from trial_data_ingestion_spark.operators.decontam import (
                scrub_contaminated_spans,
            )
            deduped = scrub_contaminated_spans(
                deduped, benchmark, id_col=cfg.id_col,
                text_col=cfg.text_col, n=cfg.decontam_ngram)
        elif cfg.decontam_policy == "drop":
            # flags come from the RAW scan: identical fingerprints
            # imply identical decontam grams, so flagging the superset
            # is exact — and the expensive hygiene/dedup subtree is
            # evaluated once, not twice (plan-census test + b05_curate
            # pin this).  When substring dedup rewrote the text, raw
            # flags would refer to runs that may no longer exist, so
            # decontam must gram the rewritten corpus itself.
            raw = (None if rewritten
                   else raw_input.select(cfg.id_col, cfg.text_col))
            deduped = decontaminate(deduped, benchmark,
                                    id_col=cfg.id_col,
                                    text_col=cfg.text_col,
                                    n=cfg.decontam_ngram,
                                    flag_from=raw)
        else:
            raise ValueError(
                f"decontam_policy must be drop|scrub, "
                f"got {cfg.decontam_policy!r}")
    if dsir_target is not None and cfg.dsir_keep_frac is not None:
        if not 0.0 < cfg.dsir_keep_frac <= 1.0:
            raise ValueError(
                f"dsir_keep_frac out of (0, 1]: {cfg.dsir_keep_frac}")
        from trial_data_ingestion_spark.operators.dsir import (
            fit_dsir, score_importance,
        )
        model = fit_dsir(dsir_target, deduped.select(cfg.text_col),
                         n_buckets=cfg.dsir_buckets)
        scored = (score_importance(deduped, model, id_col=cfg.id_col,
                                   text_col=cfg.text_col)
                  .withColumn("dsir_score",
                              F.col("log_weight") / F.col("n_grams"))
                  .persist())
        thr = scored.approxQuantile(
            "dsir_score", [1.0 - cfg.dsir_keep_frac], 0.001)[0]
        deduped = deduped.join(
            scored.where(F.col("dsir_score") >= thr)
                  .select(cfg.id_col, F.round("dsir_score", 6)
                          .alias("dsir_score")),
            cfg.id_col)
    if dup_pairs is not None:
        # near-dup families (from the MinHash/SimHash/embedding
        # verifiers — exact dedup upstream only catches identical
        # fingerprints) move into ONE split: a paraphrase must not
        # straddle train/test.  Batch-only composition: component
        # labels change as the pair graph grows, so incremental runs
        # keep the plain per-id split (stable across deltas).
        from trial_data_ingestion_spark.operators.sampling import (
            leakage_safe_split,
        )
        out = leakage_safe_split(deduped, dup_pairs, cfg.id_col,
                                 cfg.split_weights, seed=cfg.split_seed)
    else:
        out = split_by_hash(deduped, cfg.id_col, cfg.split_weights,
                            seed=cfg.split_seed)
    return _observe(out, "output")


def curate_incremental(new_docs: DataFrame, existing_curated: DataFrame,
                       benchmark: DataFrame | None = None,
                       config: CurationConfig | None = None,
                       url_blocklist: DataFrame | list | tuple | None = None,
                       url_allowlist: DataFrame | list | tuple | None = None,
                       quality_model=None) -> DataFrame:
    """Curate ONLY a delta batch against an already-curated corpus —
    the 100 TB operating mode: the standing corpus is never
    re-gated, re-hashed, or re-split; each arriving batch pays cost
    proportional to the batch.

    Stages: hygiene gate + in-batch exact dedup (identical to
    :func:`curate`), then a fingerprint anti-join against the
    existing corpus ("corpus wins" — the scan column-prunes to the
    single fingerprint column), then decontamination and the
    content-stable split (the same doc lands in the same split
    whether it arrived in the initial load or a delta — the md5
    bucket depends only on the id).

    Exactly equivalent to re-running :func:`curate` over the union
    when batch ids sort after corpus ids (parity-tested).  Substring
    dedup is corpus-global (first occurrence across the whole
    corpus), so it is rejected here — run it in periodic full sweeps
    instead.  For NEAR-dup incrementality compose with
    ``operators.incremental_dedup`` (persisted MinHash store) before
    calling this."""
    cfg = config or CurationConfig()
    if cfg.substring_dedup_ngram is not None:
        raise ValueError(
            "substring dedup is corpus-global (first occurrence over "
            "the full corpus) and cannot run incrementally; disable "
            "it here and run periodic full sweeps.")
    if cfg.line_dedup_min_chars is not None:
        raise ValueError(
            "line dedup is corpus-global; incrementally, dedup the "
            "batch against the persisted line store with "
            "operators.line_dedup.line_dedup_incremental (or the "
            "streaming sink) before curating it.")
    new_docs = _maybe_redact(new_docs, cfg)
    if cfg.url_col is not None:
        from trial_data_ingestion_spark.operators.url_filter import (
            filter_urls,
        )
        new_docs = (filter_urls(new_docs, url_col=cfg.url_col,
                                blocked_domains=url_blocklist,
                                allowed_domains=url_allowlist)
                    .where("url_keep")
                    .drop("url_domain", "url_word_score",
                          "url_keep", "url_reason"))
    gated = hygiene_gate(new_docs, cfg)
    if quality_model is not None:
        from trial_data_ingestion_spark.operators.quality_filter import (
            apply_text_quality_filter,
        )
        gated = (apply_text_quality_filter(
                     gated, quality_model,
                     threshold=cfg.quality_model_threshold)
                 .where("keep")
                 .withColumnRenamed("keep_prob", "model_quality")
                 .drop("keep"))
    if cfg.gopher:
        from trial_data_ingestion_spark.operators.gopher_rules import (
            GopherThresholds,
            gopher_filter,
        )
        t = cfg.gopher if isinstance(cfg.gopher, GopherThresholds) \
            else None
        gated = gopher_filter(gated, text_col=cfg.text_col, t=t)
    deduped = dedup_exact(gated, ["fingerprint"], order_col=cfg.id_col)
    fresh = deduped.join(
        existing_curated.select("fingerprint").distinct(),
        "fingerprint", "left_anti")
    if benchmark is not None:
        if cfg.decontam_policy == "scrub":
            # scrubbing is per-doc (no corpus-wide state), so the
            # incremental batch scrubs exactly like a full run would
            from trial_data_ingestion_spark.operators.decontam import (
                scrub_contaminated_spans,
            )
            fresh = scrub_contaminated_spans(
                fresh, benchmark, id_col=cfg.id_col,
                text_col=cfg.text_col, n=cfg.decontam_ngram)
        elif cfg.decontam_policy == "drop":
            raw = new_docs.select(cfg.id_col, cfg.text_col)
            fresh = decontaminate(fresh, benchmark, id_col=cfg.id_col,
                                  text_col=cfg.text_col,
                                  n=cfg.decontam_ngram, flag_from=raw)
        else:
            raise ValueError(
                f"decontam_policy must be drop|scrub, "
                f"got {cfg.decontam_policy!r}")
    return split_by_hash(fresh, cfg.id_col, cfg.split_weights,
                         seed=cfg.split_seed)


#: rejection_audit's stage order — curate()'s own DAG order, with the
#: hygiene bundle reported per-gate (curate applies lang/quality/
#: repetition/min_tokens as ONE conjunctive filter; the audit
#: attributes a multi-failure doc to the first gate in this order)
_AUDIT_STAGES = ("url", "lang", "quality", "repetition", "min_tokens",
                 "quality_model", "perplexity", "gopher", "exact_dup",
                 "decontam", "dsir")


def rejection_audit(docs: DataFrame, benchmark: DataFrame | None = None,
                    config: CurationConfig | None = None,
                    dsir_target: DataFrame | None = None,
                    url_blocklist: DataFrame | list | tuple | None = None,
                    url_allowlist: DataFrame | list | tuple | None = None,
                    quality_model=None, ppl_lm=None) -> DataFrame:
    """Per-document rejection taxonomy for :func:`curate`: one row
    per INPUT document with ``reason`` = the first stage (in curate's
    DAG order, ``_AUDIT_STAGES``) that rejects it, NULL for
    survivors — the attrition audit a release pipeline publishes next
    to the curated corpus (the Dolma/RefinedWeb-style funnel), and
    the pipeline-scale generalization of the reference's first-wins
    failure taxonomy (reference ``pipelines/fulltext_pipeline.py``
    failure-reason accounting; graded q25 is the per-record
    instance).

    First-wins is computed faithfully: every stage's verdict is
    evaluated exactly on the set of documents that would reach that
    stage in :func:`curate` — the corpus-dependent stages
    (perplexity-bucket cuts, keep-first dedup, DSIR's keep-quantile)
    see the same population they see in the real run, so the
    survivor set here is IDENTICAL to ``curate()``'s output ids (the
    parity test pins this).

    Cost: the narrow per-row gates add one projection over the
    hygiene sweep; each corpus-dependent stage adds the same wide op
    it costs inside curate() plus one small id-set join back.  URL
    rejections keep their sub-reason (``url:blocked_domain`` /
    ``url:blocked_words``)."""
    from pyspark.sql.window import Window
    cfg = config or CurationConfig()
    if benchmark is not None and cfg.decontam_policy != "drop":
        raise ValueError(
            "rejection_audit requires decontam_policy='drop': the "
            "scrub policy rewrites spans and rejects nothing, so "
            "there is no decontam rejection to attribute — audit "
            "scrubbed tokens via the n_scrubbed_tokens column on "
            "curate()'s output instead")
    idc, txt = cfg.id_col, cfg.text_col

    work = _maybe_redact(docs, cfg)
    has_url = cfg.url_col is not None
    if has_url:
        from trial_data_ingestion_spark.operators.url_filter import (
            filter_urls,
        )
        work = (filter_urls(work, url_col=cfg.url_col,
                            blocked_domains=url_blocklist,
                            allowed_domains=url_allowlist)
                .drop("url_domain", "url_word_score"))
    clash = [c for c in work.columns if c in _SIGNAL_NAMES]
    work = work.drop(*clash)
    keep = [c for c in (txt, "url_keep", "url_reason")
            if c in work.columns]
    rep = hygiene_report(work.select(idc, *keep), id_col=idc,
                         text_col=txt, lid=cfg.lid, keep_cols=keep)

    # each flag is the NEGATION of curate()'s keep predicate wrapped
    # null-safe: a NULL signal (e.g. n_tokens of a NULL text) fails
    # curate's where() and must fail here too, not skip the when-chain
    def _fails(keep):
        return ~F.coalesce(keep, F.lit(False))

    f_url = (_fails(F.col("url_keep")) if has_url else F.lit(False))
    f_lang = _fails(F.col("lang").isin(*cfg.languages))
    f_qual = _fails(F.col("quality") >= cfg.min_quality)
    f_rep = _fails(F.col("repeated_line_ratio")
                   <= cfg.max_repeated_line_ratio)
    f_len = _fails(F.col("n_tokens") >= cfg.min_tokens)

    # NULL text never reaches the model/ppl/decontam stages in
    # curate() (it fails min_tokens first), but the audit evaluates
    # row-local stages over ALL rows — blank it so MLlib's tokenizer
    # can't throw; verdicts of rows rejected earlier don't matter
    rep = rep.withColumn(txt, F.coalesce(F.col(txt), F.lit("")))

    if quality_model is not None:
        from trial_data_ingestion_spark.operators.quality_filter import (
            apply_text_quality_filter,
        )
        rep = apply_text_quality_filter(
            rep, quality_model, threshold=cfg.quality_model_threshold,
            keep_col="__qm_keep", prob_col="__qm_prob")
        f_model = ~F.col("__qm_keep")
    else:
        f_model = F.lit(False)

    rep = rep.withColumn(
        "__pre_ppl",
        ~(f_url | f_lang | f_qual | f_rep | f_len | f_model))

    # The corpus-dependent stages below don't just EXTEND the spine —
    # each one also RE-READS it (``rep.where(__pre_...)``) to build
    # the population its verdict is defined over, and Spark evaluates
    # a DataFrame referenced on both sides of a join twice.  Without
    # a persist, every such stage re-runs the hygiene sweep (the
    # Arrow LID kernel — the audit's most expensive op) end to end.
    # Persist once at the LAST spine version the re-reader consumes:
    # pre-window for the perplexity stage, post-window for the
    # decontam-rewrite and DSIR stages.  At 100 TB this is the
    # standard scored-projection materialization (MEMORY_AND_DISK,
    # spills instead of OOM) — strictly cheaper than a second
    # full-corpus scoring pass.  Callers that materialize the audit
    # once (the normal case) can let the cache age out; the frames
    # are not unpersisted here because the returned plan still reads
    # them lazily.
    second_read_pre_window = ppl_lm is not None
    second_read_post_window = (
        (benchmark is not None
         and (cfg.substring_dedup_ngram is not None
              or cfg.line_dedup_min_chars is not None))
        or (dsir_target is not None and cfg.dsir_keep_frac is not None))

    def _pruned_persist(df):
        # materialize ONLY the columns the reason chain and the
        # branch populations still read — a full-width persist would
        # also evaluate the hygiene signals every consumer normally
        # column-prunes away (cache materialization defeats pruning)
        need = (idc, txt, "url_keep", "url_reason", "lang", "quality",
                "repeated_line_ratio", "n_tokens", "__qm_keep",
                "__ppl_ok", "gopher_passes", "fingerprint",
                "__pre_ppl", "__pre_dedup", "__fp_rn",
                "__pre_decontam")
        return df.select(*[c for c in need if c in df.columns]) \
                 .persist()

    if second_read_pre_window:
        rep = _pruned_persist(rep)

    if ppl_lm is not None:
        from trial_data_ingestion_spark.operators.ngram_lm import (
            perplexity_buckets, score_perplexity,
        )
        reached = rep.where("__pre_ppl").select(idc, txt)
        scored = perplexity_buckets(
            score_perplexity(reached, ppl_lm, id_col=idc,
                             text_col=txt))
        # membership convention is KEEP-side on purpose: curate()'s
        # inner join drops reaching docs the scorer OMITS (zero
        # scoreable bigrams after normalization) as well as bad-bucket
        # docs — a flag-the-bad join would call the unscored ones
        # survivors and break the survivor-parity invariant
        good = (scored.where(F.col("ppl_bucket")
                             .isin(*cfg.ppl_keep_buckets))
                .select(F.col(idc), F.lit(True).alias("__ppl_ok")))
        rep = rep.join(good, idc, "left")
        f_ppl = (F.col("__pre_ppl")
                 & ~F.coalesce(F.col("__ppl_ok"), F.lit(False)))
    else:
        f_ppl = F.lit(False)

    if cfg.gopher:
        from trial_data_ingestion_spark.operators.gopher_rules import (
            GopherThresholds, gopher_report,
        )
        t = cfg.gopher if isinstance(cfg.gopher, GopherThresholds) \
            else None
        rep = gopher_report(rep, text_col=txt, t=t)
        f_gopher = ~F.col("gopher_passes")
    else:
        f_gopher = F.lit(False)

    rep = rep.withColumn("__pre_dedup",
                         F.col("__pre_ppl") & ~f_ppl & ~f_gopher)
    # keep-first among the docs that reach dedup: rows that already
    # failed sort after every reaching row, so rn=1 is exactly the
    # min-id reaching doc of each fingerprint (curate's keeper)
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("__pre_dedup").desc(), F.col(idc).asc())
    rep = rep.withColumn("__fp_rn", F.row_number().over(w))
    f_dup = F.col("__pre_dedup") & (F.col("__fp_rn") > 1)
    rep = rep.withColumn("__pre_decontam",
                         F.col("__pre_dedup") & ~f_dup)
    if second_read_post_window:
        # covers the window shuffle too: the decontam-rewrite /
        # DSIR populations are defined post-dedup
        rep = _pruned_persist(rep)

    if benchmark is not None:
        from trial_data_ingestion_spark.operators.decontam import (
            contaminated_ids,
        )
        rewritten = (cfg.substring_dedup_ngram is not None
                     or cfg.line_dedup_min_chars is not None)
        if rewritten:
            # curate rewrites text (line/substring dedup) before
            # decontam, and those rewrites see exactly the reaching
            # set — replicate on it (same rule as curate: raw-text
            # flags would refer to deleted runs)
            reached = rep.where("__pre_decontam").select(idc, txt)
            if cfg.line_dedup_min_chars is not None:
                from trial_data_ingestion_spark.operators.line_dedup \
                    import line_dedup
                reached = line_dedup(
                    reached, idc, txt,
                    min_chars=cfg.line_dedup_min_chars) \
                    .drop("n_removed_lines")
            if cfg.substring_dedup_ngram is not None:
                from trial_data_ingestion_spark.operators \
                    .substring_dedup import remove_repeated_substrings
                reached = remove_repeated_substrings(
                    reached, idc, txt, n=cfg.substring_dedup_ngram)
            flag_src = reached
        else:
            # same superset rule as curate(): flags from the raw
            # scan are exact (extra flagged ids can only hit docs
            # already rejected earlier — first-wins hides them)
            flag_src = docs.select(idc, txt)
        bad = (contaminated_ids(flag_src, benchmark, id_col=idc,
                                text_col=txt, n=cfg.decontam_ngram)
               .withColumn("__f_dc", F.lit(True)))
        rep = rep.join(bad, idc, "left")
        f_dc = (F.col("__pre_decontam")
                & F.coalesce(F.col("__f_dc"), F.lit(False)))
    else:
        f_dc = F.lit(False)
    rep = rep.withColumn("__pre_dsir", F.col("__pre_decontam") & ~f_dc)

    if dsir_target is not None and cfg.dsir_keep_frac is not None:
        if not 0.0 < cfg.dsir_keep_frac <= 1.0:
            raise ValueError(
                f"dsir_keep_frac out of (0, 1]: {cfg.dsir_keep_frac}")
        from trial_data_ingestion_spark.operators.dsir import (
            fit_dsir, score_importance,
        )
        reached = rep.where("__pre_dsir").select(idc, txt)
        model = fit_dsir(dsir_target, reached.select(txt),
                         n_buckets=cfg.dsir_buckets)
        scored = (score_importance(reached, model, id_col=idc,
                                   text_col=txt)
                  .withColumn("dsir_score",
                              F.col("log_weight") / F.col("n_grams"))
                  .persist())
        thr = scored.approxQuantile(
            "dsir_score", [1.0 - cfg.dsir_keep_frac], 0.001)[0]
        # KEEP-side membership, same reason as the ppl stage: curate's
        # inner join also drops reaching docs score_importance omits
        # (zero grams), not just the below-threshold ones
        good = (scored.where(F.col("dsir_score") >= thr)
                .select(F.col(idc), F.lit(True).alias("__ds_ok")))
        rep = rep.join(good, idc, "left")
        f_ds = (F.col("__pre_dsir")
                & ~F.coalesce(F.col("__ds_ok"), F.lit(False)))
    else:
        f_ds = F.lit(False)

    url_label = (F.concat(F.lit("url:"), F.col("url_reason"))
                 if has_url else F.lit("url"))
    reason = (F.when(f_url, url_label)
              .when(f_lang, F.lit("lang"))
              .when(f_qual, F.lit("quality"))
              .when(f_rep, F.lit("repetition"))
              .when(f_len, F.lit("min_tokens"))
              .when(f_model, F.lit("quality_model"))
              .when(f_ppl, F.lit("perplexity"))
              .when(f_gopher, F.lit("gopher"))
              .when(f_dup, F.lit("exact_dup"))
              .when(f_dc, F.lit("decontam"))
              .when(f_ds, F.lit("dsir"))
              .otherwise(F.lit(None).cast("string")))
    return rep.select(F.col(idc), reason.alias("reason"))


def curation_funnel(docs: DataFrame, **kwargs) -> DataFrame:
    """Stage-ordered attrition table over :func:`rejection_audit`:
    one row per stage that rejected at least one document plus a
    ``survived`` row — (stage, n_docs, frac_of_input).  The artifact
    a dataset card's "filtering" section quotes."""
    audit = rejection_audit(docs, **kwargs)
    stage = F.coalesce(F.col("reason"), F.lit("survived"))
    # url sub-reasons roll up to their stage position; order index
    # pins DAG order in the output without a driver sort
    base = F.when(F.col("stage") == "survived",
                  F.lit(len(_AUDIT_STAGES)))
    for i, s in enumerate(_AUDIT_STAGES):
        base = base.when(F.split(F.col("stage"), ":")[0] == s,
                         F.lit(i))
    agg = (audit.select(stage.alias("stage"))
           .groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))
           .withColumn("__ord", base))
    from pyspark.sql.window import Window
    total = F.sum("n_docs").over(Window.partitionBy())
    return (agg.withColumn("frac_of_input",
                           F.round(F.col("n_docs") / total, 6))
            .orderBy("__ord", "stage")
            .drop("__ord"))

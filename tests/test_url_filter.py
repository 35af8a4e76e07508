"""RefinedWeb-style URL filtering: domain blocklist, allowlist
override, weighted keyword score, audit-trail flags, codegen plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (0, "https://example.com/articles/science"),
        (1, "http://www.badcasino.net/win"),            # keyword in host
        (2, "https://blog.spamsite.org/post?id=3"),     # blocklisted domain
        (3, "https://news.example.co.uk/casino-review"),  # 1 path hit only
        (4, "https://sexhealth.nhs-example.org/advice"),  # allowlisted
        (5, "https://files.example.com/t/porn/x?q=xxx"),  # 2 path hits
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_filter_urls_known_answers(spark):
    from trial_data_ingestion_spark.operators.url_filter import filter_urls
    blocked = spark.createDataFrame([("spamsite.org",)], "d string")
    out = filter_urls(
        _df(spark),
        blocked_domains=blocked,
        allowed_domains=["nhs-example.org"],
    ).select("doc_id", "url_keep", "url_reason", "url_word_score")
    got = {r["doc_id"]: (r["url_keep"], r["url_reason"],
                         r["url_word_score"]) for r in out.collect()}
    assert got[0] == (True, "ok", 0.0)
    assert got[1] == (False, "blocked_words", 2.0)      # host hit x2 weight
    assert got[2] == (False, "blocked_domain", 0.0)
    assert got[3] == (True, "ok", 1.0)                  # 1 path hit < 2.0
    assert got[4][0] is True and got[4][1] == "allowed"
    assert got[5] == (False, "blocked_words", 2.0)      # two path hits
    # audit trail: every input row still present
    assert len(got) == 6


def test_filter_urls_null_url_is_visible_category(spark):
    """A NULL URL must surface as url_reason='no_url', never fall
    through the NULL-propagating when-chain to an implicit 'ok'
    (ADVICE round 5); keep_missing sets the policy."""
    from trial_data_ingestion_spark.operators.url_filter import filter_urls
    df = spark.createDataFrame(
        [(0, "https://example.com/a"), (1, None)],
        "doc_id long, url string")
    blocked = spark.createDataFrame([("spamsite.org",)], "d string")
    out = {r["doc_id"]: (r["url_keep"], r["url_reason"]) for r in
           filter_urls(df, blocked_domains=blocked)
           .select("doc_id", "url_keep", "url_reason").collect()}
    assert out[0] == (True, "ok")
    assert out[1] == (True, "no_url")       # default: keep, but visible
    strict = {r["doc_id"]: (r["url_keep"], r["url_reason"]) for r in
              filter_urls(df, blocked_domains=blocked,
                          keep_missing=False)
              .select("doc_id", "url_keep", "url_reason").collect()}
    assert strict[1] == (False, "no_url")   # strict provenance: drop


def test_filter_urls_list_blocklist_and_no_words(spark):
    from trial_data_ingestion_spark.operators.url_filter import filter_urls
    out = filter_urls(_df(spark), blocked_domains=["badcasino.net"],
                      blocked_words=())
    got = {r["doc_id"]: r["url_reason"] for r in out.collect()}
    assert got[1] == "blocked_domain"
    assert all(v == "ok" for k, v in got.items() if k != 1)


def test_filter_urls_plan_broadcast_and_no_python(spark):
    """The corpus is never shuffled: blocklist joins broadcast, the
    keyword score is codegen regexp."""
    from trial_data_ingestion_spark.operators.url_filter import filter_urls
    blocked = spark.createDataFrame([("spamsite.org",)], "d string")
    allowed = spark.createDataFrame([("nhs-example.org",)], "d string")
    plan = (filter_urls(_df(spark), blocked_domains=blocked,
                        allowed_domains=allowed)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_filter_urls_composes_with_where_pushdown(spark, tmp_path):
    """where(url_keep) after the flagging is an executable filter; the
    materialized corpus matches a python recomputation."""
    from trial_data_ingestion_spark.operators.url_filter import filter_urls
    p = str(tmp_path / "urls")
    _df(spark).write.parquet(p)
    df = spark.read.parquet(p)
    out = filter_urls(df, blocked_domains=["spamsite.org"]) \
        .where("url_keep").select("doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [0, 3]          # no allowlist here, so 4's host hit blocks

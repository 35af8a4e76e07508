"""Property-style tests (fixed-seed adversarial corpora, the
test_text_properties convention) for main-content extraction and the
dedup survivor election."""

from __future__ import annotations

import random


def _html_corpus(n: int = 300) -> list:
    rng = random.Random(0xBEEF)
    tags = ["p", "div", "li", "h2", "nav", "footer", "a", "b",
            "table", "tr", "td", "script", "style", "pre"]
    words = ["the", "quick", "spark", "shuffle", "data", "x",
             "click", "here", "2024", "&amp;", "<", ">"]
    out = [None, "", "<", "<p>", "</p><p>", "<a href='/x'>",
           "<p>unclosed <b>bold &amp", "<nav>" * 50,
           "plain text with no tags at all " * 3]
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(0, 30)):
            r = rng.random()
            if r < 0.35:
                t = rng.choice(tags)
                attr = " href='/x'" if t == "a" and rng.random() < .7 \
                    else ""
                parts.append(f"<{t}{attr}>")
            elif r < 0.5:
                parts.append(f"</{rng.choice(tags)}>")
            else:
                parts.append(" ".join(
                    rng.choice(words)
                    for _ in range(rng.randrange(1, 12))))
        h = "".join(parts)
        if rng.random() < 0.2:          # truncate mid-tag
            h = h[:rng.randrange(0, len(h) + 1)]
        out.append(h)
    return out


def test_extract_main_content_total_function_and_invariants():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_main_content,
    )
    for h in _html_corpus():
        text, kept, total, frac = extract_main_content(h)
        assert 0 <= kept <= total
        assert 0.0 <= frac <= 1.0
        assert (kept == 0) == (text == "")
        assert "\x00" not in text
        # kept block count equals emitted line count
        if text:
            assert text.count("\n") == kept - 1
        # deterministic
        assert extract_main_content(h) == (text, kept, total, frac)


def test_extract_links_total_function_and_dedup():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_links,
    )
    for h in _html_corpus():
        plain = extract_links(h, base_url="https://b.org/d/")
        pairs = extract_links(h, base_url="https://b.org/d/",
                              with_text=True)
        assert [u for u, _ in pairs] == plain
        assert len(set(plain)) == len(plain)
        for u in plain:
            assert u.startswith(("http://", "https://"))


def test_keep_best_matches_python_election(spark):
    """Random confirmed-pair graphs + random scores: keep_best must
    equal a from-scratch union-find + max-score (tie: min id)
    election, and untouched docs always survive."""
    from trial_data_ingestion_spark.operators import dedup

    rng = random.Random(0x5EED)
    n = 60
    ids = list(range(n))
    scores = {i: (None if rng.random() < 0.1
                  else round(rng.random(), 3)) for i in ids}
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]

    # python reference
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict = {}
    for a, b in edges:
        comps.setdefault(find(a), set()).update((a, b))
    expected_drop = set()
    for members in comps.values():
        def key(i):
            s = scores[i]
            return (0 if s is None else 1, s if s is not None else 0.0,
                    -i)
        winner = max(members, key=key)
        expected_drop |= members - {winner}

    df = spark.createDataFrame(
        [(i, scores[i]) for i in ids], "doc_id long, quality double")
    pairs = spark.createDataFrame(edges or [(0, 1)],
                                  "doc_a long, doc_b long")
    if not edges:
        return
    kept = {r["doc_id"] for r in
            dedup.keep_best_per_cluster(df, pairs, "doc_id",
                                        "quality").collect()}
    assert kept == set(ids) - expected_drop

"""Round-11 pins: URL/host-level dedup (the crawl granularity) and the
tokenizer-pluggable packing cost column.

URL normalization IS the dedup key, so its edge behavior is pinned
directly: every variant class the synthetic corpus sprinkles (case,
``www.``, ``utm_*`` tracking params, fragments, trailing slashes) must
collapse, normalization must be idempotent, and non-tracking query
params must survive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import dedup


def _norm(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(dedup.normalize_url("url").alias("n")).collect()]


def test_normalize_url_collapses_variant_classes(spark):
    variants = [
        "https://example.com/p/7",
        "HTTPS://EXAMPLE.COM/p/7",
        "https://www.example.com/p/7",
        "https://example.com/p/7/",
        "https://example.com/p/7//",
        "https://example.com/p/7?utm_source=feed",
        "https://example.com/p/7/?utm_source=a&utm_id=9",
        "https://example.com/p/7#frag",
        "https://WWW.example.com/p/7/?utm_campaign=x#sec2",
    ]
    assert set(_norm(spark, variants)) == {"https://example.com/p/7"}


def test_normalize_url_preserves_signal(spark):
    # distinct pages stay distinct; non-tracking params survive
    kept = _norm(
        spark,
        [
            "https://example.com/p/7",
            "https://example.com/p/8",
            "https://other.com/p/7",
            "https://example.com/p/7?page=2",
            "https://example.com/p/7?page=2&utm_source=feed",
        ],
    )
    assert len(set(kept)) == 4
    assert "https://example.com/p/7?page=2" in kept
    # utm removal keeps the real param
    assert kept[4] == "https://example.com/p/7?page=2"


def test_normalize_url_idempotent(spark):
    urls = [
        "https://WWW.Example.com/a/b/?utm_x=1#f",
        "https://example.com",
        "https://example.com/",
        # the r11 review case: unanchored single-strip normalized this
        # to www.example.com on pass 1 and example.com on pass 2
        "https://www.www.example.com/p",
    ]
    once = _norm(spark, urls)
    again = _norm(spark, once)
    assert once == again
    assert once[3] == "https://example.com/p"


def test_normalize_url_anchored_www_strip(spark):
    # www. repeats collapse with the plain host...
    assert set(
        _norm(
            spark,
            [
                "https://example.com/p",
                "https://www.example.com/p",
                "https://www.www.example.com/p",
            ],
        )
    ) == {"https://example.com/p"}
    # ...but a URL EMBEDDED in a query param is never rewritten, and a
    # host merely STARTING with 'www' (no dot) is untouched
    kept = _norm(
        spark,
        [
            "https://a.com/r?to=https://www.b.com/x",
            "https://wwwhost.com/p",
        ],
    )
    assert kept == [
        "https://a.com/r?to=https://www.b.com/x",
        "https://wwwhost.com/p",
    ]


def test_url_host_extraction(spark):
    hosts = [
        r.h
        for r in spark.createDataFrame(
            [
                ("https://example.com/p/7",),
                ("https://sub.example.co.uk/x?q=1",),
                ("ftp+ssh://weird-scheme.net/",),
                ("not a url",),
            ],
            "url string",
        )
        .select(dedup.url_host("url").alias("h"))
        .collect()
    ]
    assert hosts == ["example.com", "sub.example.co.uk", "weird-scheme.net", ""]


def test_url_dedup_groups_first_seen(spark):
    df = spark.createDataFrame(
        [
            (3, "https://www.a.com/x/"),
            (1, "https://a.com/x?utm_s=1"),
            (2, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    rows = {
        r.norm_url: (r.keep_id, r.n_copies)
        for r in dedup.url_dedup_groups(df).collect()
    }
    assert rows == {
        "https://a.com/x": (1, 2),
        "https://a.com/y": (2, 1),
    }


def test_host_dup_stats_flags_boilerplate_farm(spark):
    # farm.com: 4 pages, 4 urls, 1 distinct text -> ratio 0.75
    # fresh.com: 2 pages, all distinct -> ratio 0.0
    rows = [
        (1, "https://farm.com/a", "same text"),
        (2, "https://farm.com/b", "same text"),
        (3, "https://farm.com/c", "Same   TEXT"),  # canon-equal
        (4, "https://farm.com/d", "same text"),
        (5, "https://fresh.com/a", "alpha"),
        (6, "https://fresh.com/b", "beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    stats = {r.host: r for r in dedup.host_dup_stats(df).collect()}
    farm, fresh = stats["farm.com"], stats["fresh.com"]
    assert (farm.n_pages, farm.n_urls, farm.n_distinct_texts) == (4, 4, 1)
    assert abs(farm.text_dup_ratio - 0.75) < 1e-9
    assert (fresh.n_pages, fresh.n_urls, fresh.n_distinct_texts) == (2, 2, 2)
    assert fresh.text_dup_ratio == 0.0


def test_pandas_token_counter_matches_expression(spark):
    """The Arrow-batched counter must be bit-equal to the JVM expression
    on every segmentation class the regex distinguishes: letter runs,
    digit runs, punctuation singles, the full Python whitespace set
    (unicode spaces), empties, and NULL (both sides null, never 0/-1)."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators import text as T

    rows = [
        (1, "hello world"),
        (2, "a1b2c3 -- x!?"),
        (3, "tabs\tand unicode spaces　here"),
        (4, ""),
        (5, None),
        (6, "digits 12345 67 punct ,,,"),
        (7, "CamelCase and UPPER lower"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        T.bpe_ish_token_count("text").cast("long").alias("expr_n"),
        T.pandas_bpe_ish_token_count("text").alias("udf_n"),
    ).collect()
    for r in out:
        assert r.expr_n == r.udf_n, (r.doc_id, r.expr_n, r.udf_n)
    assert {r.doc_id: r.udf_n for r in out}[5] is None


def test_pack_bins_cost_col_plug(spark):
    """A caller-supplied cost column replaces the default expression
    cost exactly (same packing when it computes the same counts), and
    sep_overhead still applies on top."""
    from nyc_opendata_etl_spark.operators import curation
    from nyc_opendata_etl_spark.operators import text as T

    rows = [(i, "word " * (3 + i % 11) + "!") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = curation.pack_bins_decreasing(df, token_budget=32).collect()
    plugged = curation.pack_bins_decreasing(
        df, token_budget=32, cost_col=T.pandas_bpe_ish_token_count("text")
    ).collect()
    key = lambda rs: sorted((r.doc_id, r.cost, r.pack_id, r.pack_fill) for r in rs)
    assert key(default) == key(plugged)


def test_host_gate_drops_farm_keeps_fresh(spark):
    """The integer farm threshold (dup_count * 20 < n_pages) must drop
    a host serving duplicate texts for >=5% of its pages and keep one
    below the line — pinned here because the synthetic corpus's dup
    groups scatter across hosts, so the registered query's gate rarely
    fires there."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators import text as T

    # farm.com: 20 pages, 2 of them duplicates (10% dup) -> dropped
    # fresh.com: 20 pages, all distinct (0%) -> kept
    # edge.com: 20 pages, exactly 1 dup (5%): 1*20 < 20 is False -> dropped
    rows = []
    for i in range(20):
        rows.append((100 + i, "https://farm.com/p", f"farm text {i if i < 18 else 0}"))
        rows.append((200 + i, "https://fresh.com/p", f"fresh text {i}"))
        rows.append((300 + i, "https://edge.com/p", f"edge text {i if i < 19 else 0}"))
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    pages = df.select(
        "doc_id",
        dedup.url_host(dedup.normalize_url("url")).alias("host"),
        T.fingerprint("text").alias("content_hash"),
    )
    stats = pages.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.count_distinct("content_hash").alias("n_distinct_texts"),
    )
    good = stats.filter(
        (F.col("n_pages") - F.col("n_distinct_texts")) * 20 < F.col("n_pages")
    ).select("host")
    kept = {
        r.host
        for r in pages.join(F.broadcast(good), "host", "left_semi").collect()
    }
    assert kept == {"fresh.com"}


def test_normalize_url_utm_first_mixed_query_pin(spark):
    """Round-12 closed the round-11 documented limitation: the
    split/filter/rejoin param normalizer re-attaches the surviving
    query with '?', so utm-first-with-real-param-after merges with the
    plain '?page=2' form instead of keeping a stray '&' (full edge
    matrix in test_round12_ops.py)."""
    out = _norm(spark, ["https://a.com/x?utm_s=1&page=2"])
    assert out == ["https://a.com/x?page=2"]
    # and it collapses with its own variants AND the '?page=2' form
    again = _norm(spark, ["https://WWW.a.com/x?utm_s=9&page=2#f"])
    assert again == out


def test_perplexity_gate_tertile_laws(spark):
    """Gate laws on the real sf0.001 corpus: every scored doc gets a
    bucket; tertiles are near-equal (within interpolation slack);
    kept == not tail; bucket boundaries respect the score ordering
    (min(head) >= max(middle) boundary-wise, etc.)."""
    from nyc_opendata_etl_spark.queries import queries

    rows = queries()["corpus_perplexity_gate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r.ppl_bucket, []).append(r)
        assert r.kept == (r.ppl_bucket != "tail")
    assert set(by) == {"head", "middle", "tail"}
    for b, members in by.items():
        assert abs(len(members) - n / 3) <= n * 0.05 + 2, (b, len(members))
    assert min(r.mean_logprob for r in by["head"]) >= max(
        r.mean_logprob for r in by["middle"]
    )
    assert min(r.mean_logprob for r in by["middle"]) >= max(
        r.mean_logprob for r in by["tail"]
    )

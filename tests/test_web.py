"""URL/domain web-curation operators (pipelines/web.py): canonicalization
rules against hand-computed expectations, exact-URL dedup, the stored
canonical-digest index, blocklists, and the zero-shuffle plan contract."""

from pyspark.sql import functions as F

from laradb_spark.pipelines import web as wb


def test_canonicalization_rules_hand_computed(spark):
    cases = [
        # (raw, canonical, domain)
        ("HTTP://WWW.Site.COM:80/A/b?utm_source=x&b=2&a=1#frag",
         "http://site.com/A/b?a=1&b=2", "site.com"),
        ("https://site.com:443/", "https://site.com/", "site.com"),
        ("https://site.com:8443/x/", "https://site.com:8443/x", "site.com:8443"),
        ("http://site.com", "http://site.com/", "site.com"),
        ("http://site.com/x/y/", "http://site.com/x/y", "site.com"),
        ("http://site.com/?fbclid=1&gclid=2&utm_campaign=3", "http://site.com/", "site.com"),
        ("http://site.com/?ref=a&refresh=1", "http://site.com/?refresh=1", "site.com"),
        ("ftp://Host.Net:21/file", "ftp://host.net:21/file", "host.net:21"),
        ("not a url at all", "not a url at all", ""),
        ("", "", ""),
        (None, "", ""),
        # path case is preserved; query values are preserved verbatim
        ("http://a.com/CaseSensitive?Z=9&a=1", "http://a.com/CaseSensitive?Z=9&a=1", "a.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)], "doc_id long, url string"
    )
    got = {r.doc_id: (r.canonical_url, r.domain)
           for r in wb.url_canonicalize(df).collect()}
    for i, (raw, canon, dom) in enumerate(cases):
        assert got[i] == (canon, dom), (raw, got[i], (canon, dom))


def test_canonicalize_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = wb.url_canonicalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_exact_url_dedup_keeps_min_id(spark):
    rows = [
        (1, "http://WWW.a.com:80/p?b=2&a=1"),
        (2, "http://a.com/p?a=1&b=2"),        # same canonical as 1
        (3, "http://a.com/p?a=1&b=2&utm_x=9"),  # same canonical as 1
        (4, "https://a.com/p?a=1&b=2"),       # different scheme -> kept
        (5, "http://b.com/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r.doc_id for r in wb.drop_exact_url_duplicates(df).collect()}
    assert kept == {1, 4, 5}
    clusters = {r.keep_id: r.n_copies for r in wb.exact_url_duplicates(df).collect()}
    assert clusters == {1: 3, 4: 1, 5: 1}


def test_url_index_incremental(spark, tmp_path):
    hist = spark.createDataFrame(
        [(1, "http://a.com/p?a=1"), (2, "http://b.com/q")],
        "doc_id long, url string",
    )
    idx = str(tmp_path / "uidx")
    wb.url_index_build(hist, idx)
    batch = spark.createDataFrame(
        [
            (10, "http://WWW.a.com:80/p?a=1&utm_y=z"),  # seen (canonical match)
            (11, "http://a.com/new"),                    # novel
            (12, "http://b.com/q#frag"),                 # seen
        ],
        "doc_id long, url string",
    )
    fresh = {r.doc_id for r in wb.drop_seen_urls(batch, idx).collect()}
    assert fresh == {11}
    # appending makes the batch history for the next shard
    wb.url_index_update(batch, idx)
    later = spark.createDataFrame([(20, "http://a.com/new?utm_a=1")], "doc_id long, url string")
    assert wb.drop_seen_urls(later, idx).count() == 0


def test_domain_blocklist_both_forms(spark):
    rows = [
        (1, "http://www.spam.net/x"),
        (2, "http://ok.com/x"),
        (3, "https://spam.net:443/y"),
        (4, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r.doc_id for r in wb.domain_blocklist_filter(df, ["spam.net"]).collect()}
    assert kept == {2, 4}
    bl = spark.createDataFrame([("spam.net",)], "domain string")
    kept2 = {r.doc_id for r in wb.domain_blocklist_filter(df, bl).collect()}
    assert kept2 == {2, 4}
    # literal-list form stays a scan predicate (no join, no exchange)
    plan = wb.domain_blocklist_filter(df, ["spam.net"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_domain_cap_composes(spark):
    from laradb_spark.pipelines.curation import cap_per_group

    rows = [(i, f"http://dom{i % 2}.com/p{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    canon = wb.url_canonicalize(df)
    capped = cap_per_group(canon, "domain", 3)
    got = capped.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r.domain: r.n for r in got} == {"dom0.com": 3, "dom1.com": 3}


def test_url_ingest_loop_screens_across_batches(spark, tmp_path):
    """url_ingest_stream: blocklisted domains never land; a canonical URL
    entering in batch 1 blocks every later raw spelling of it; within-
    batch canonical dups collapse to one row."""
    import os
    import time

    from pyspark.sql import types as T

    from laradb_spark.streaming import url_ingest_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
    ])
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "http://a.com/p?a=1"),
         (2, "HTTP://WWW.a.com:80/p?a=1&utm_s=x"),  # within-batch dup of 1
         (3, "http://spam.net/x")],                  # blocklisted
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [(10, "http://a.com/p?a=1#frag"),   # seen in batch 1 -> dropped
         (11, "http://a.com/new")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("uidx", "uout", "uck"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = url_ingest_stream(stream, idx, out, ck, blocked_domains=["spam.net"])
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 11} or got == {2, 11}  # one winner per canonical in batch 1
    assert spark.read.parquet(idx).distinct().count() == 2


def test_extract_text_hand_computed(spark):
    from laradb_spark.pipelines.web import html_extract

    rows = [
        (1, "<html><head><script>if (a<b) {x}</script><style>p{}</style></head>"
            "<body><h1>Title</h1><p>Hello <b>world</b></p><!-- no --></body></html>"),
        (2, "plain text, no markup at all"),
        (3, "a &lt;tag&gt; &quot;quoted&quot; &#39;s &nbsp; fish &amp; chips &amp;lt;"),
        (4, "start <script>dropped to end of doc"),
        (5, None),
        (6, "spaced\t\tout\n\nlines  here "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.had_markup) for r in html_extract(df).collect()}
    assert got[1] == ("Title Hello world", True)
    assert got[2] == ("plain text, no markup at all", False)
    # &amp; decodes LAST: double-encoded "&amp;lt;" yields literal "&lt;"
    assert got[3] == ("a <tag> \"quoted\" 's fish & chips &lt;", True)
    assert got[4] == ("start", True)  # unterminated script drops to EOF
    assert got[5] == ("", False)
    assert got[6] == ("spaced out lines here", False)

"""URL canonicalization + per-domain policy (operators/urlops.py)."""

from pyspark.sql import functions as F

from spectraplex_spark.operators.urlops import (
    canonical_url_dedup,
    canonicalize_url,
    cap_per_domain,
    registered_domain,
    url_host,
)

CANON_CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#frag",
     "http://example.com/Path?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://sub.Example.com:8080/a/b/?ref=z&fbclid=q",
     "https://sub.example.com:8080/a/b"),
    ("http://example.com/?utm_campaign=z", "http://example.com/"),
    ("https://www.example.com/x?a=1&b=2", "https://example.com/x?a=1&b=2"),
    ("https://www.example.com/x?b=2&a=1&utm_medium=m",
     "https://example.com/x?a=1&b=2"),
    # non-default port on http is KEPT; case-only host variants collapse
    ("http://Example.com:8080/q", "http://example.com:8080/q"),
    # fragment-only difference collapses
    ("https://example.com/x#section-2", "https://example.com/x"),
    # percent-encoded UNRESERVED chars decode (%64='d', %7E='~') so the
    # encoded and plain spellings collide; reserved %2F stays encoded;
    # malformed escapes pass through verbatim
    ("https://example.com/%64ocs/%7Ea?b=2&a=1",
     "https://example.com/docs/~a?a=1&b=2"),
    ("https://example.com/a%2Fb", "https://example.com/a%2Fb"),
    ("https://example.com/x%G1y%", "https://example.com/x%G1y%"),
    ("https://example.com/a%%41", "https://example.com/a%A"),
    # r13 review findings:
    # kept (reserved) escape hex canonicalizes to UPPER case — %2f and
    # %2F spellings of one URL must land in the same dedup group
    ("https://example.com/a%2fb", "https://example.com/a%2Fb"),
    # multi-slash tails strip idempotently (canon(canon(u)) == canon(u))
    ("http://example.com/a//", "http://example.com/a"),
    ("http://example.com//", "http://example.com/"),
    # userinfo is not part of the host
    ("https://alice@example.com/x", "https://example.com/x"),
    ("https://alice:pw@www.Example.com/x", "https://example.com/x"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CANON_CASES)], ["i", "url"]
    )
    got = {r.i: r.c for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (src, exp) in enumerate(CANON_CASES):
        assert got[i] == exp, src


def test_host_and_registered_domain(spark):
    cases = [
        ("https://a.b.Example.com/x", "a.b.example.com", "example.com"),
        ("http://www.news.site.org:80/", "news.site.org", "site.org"),
        ("https://single/x", "single", "single"),  # degenerate 1-label host
        ("https://cdn.shop.io:9000/a", "cdn.shop.io:9000", "shop.io"),  # port stripped from domain
        # PSL-subset suffixes keep three labels
        ("https://a.b.example.co.uk/x", "a.b.example.co.uk", "example.co.uk"),
        ("https://shop.com.au/", "shop.com.au", "shop.com.au"),
        ("https://co.uk/x", "co.uk", "co.uk"),  # bare public suffix: degenerate, kept whole
        # r13 review findings: IP hosts keep the WHOLE address (label
        # arithmetic would merge unrelated sites under 'last.two'),
        # FQDN trailing dots drop, empty hosts are NULL (not ''), and
        # userinfo never reaches the domain
        ("http://93.184.216.34/x", "93.184.216.34", "93.184.216.34"),
        ("http://example.com./", "example.com.", "example.com"),
        ("file:///etc/passwd", "", None),
        ("https://alice@example.com/x", "example.com", "example.com"),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], ["i", "url"])
    rows = df.select(
        "i",
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    for r in rows:
        assert (r.h, r.d) == cases[r.i][1:], cases[r.i][0]


def test_canonical_dedup_groups_variants(spark):
    urls = [
        (1, "https://www.example.com/p?b=2&a=1"),
        (2, "https://example.com:443/p/?a=1&b=2&utm_source=s"),
        (3, "HTTPS://EXAMPLE.COM/p?a=1&b=2#frag"),
        (4, "https://example.com/q"),
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {r.canonical_url: (r.n_copies, r.representative)
           for r in canonical_url_dedup(df).collect()}
    assert got == {
        "https://example.com/p?a=1&b=2": (3, 1),
        "https://example.com/q": (1, 4),
    }


def test_cap_per_domain_keeps_smallest_ids(spark):
    rows = [(i, f"https://{'ab'[i % 2]}.dom{i % 2}.com/x/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = cap_per_domain(df, cap=3).select("domain", "doc_id").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    assert sorted(by_dom) == ["dom0.com", "dom1.com"]
    assert sorted(by_dom["dom0.com"]) == [0, 2, 4]
    assert sorted(by_dom["dom1.com"]) == [1, 3, 5]


def test_canonicalization_is_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "https://example.com/x")], ["doc_id", "url"])
    plan = (
        df.select(canonicalize_url(F.col("url")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_normalize_idn_host_known_vectors(spark):
    from spectraplex_spark.operators.urlops import normalize_idn_host

    cases = [
        ("bücher.example", "xn--bcher-kva.example"),       # RFC 3492 vector
        ("münchen.de", "xn--mnchen-3ya.de"),
        ("ascii.example.com", "ascii.example.com"),        # ASCII fast path
        ("xn--bcher-kva.example", "xn--bcher-kva.example"),  # already ACE
        (None, None),                                      # null-safe
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, h string"
    )
    got = {r.i: r.n for r in df.select("i", normalize_idn_host(F.col("h")).alias("n")).collect()}
    for i, (_, exp) in enumerate(cases):
        assert got[i] == exp, cases[i][0]


def test_schemeless_urls_are_null_not_merged(spark):
    """No '://' → canonical_url/host/domain NULL (visible as malformed)
    rather than '://host/path' with every such row lumped into one ''
    domain; cap_per_domain passes NULL-domain rows through uncapped."""
    df = spark.createDataFrame(
        [(1, "example.com/x"), (2, "other.org/y"), (3, "https://ok.com/z"),
         (4, "www.nohost.net")],
        ["doc_id", "url"],
    )
    got = {
        r["doc_id"]: (r["c"], r["h"], r["d"])
        for r in df.select(
            "doc_id",
            canonicalize_url(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    assert got[3] == ("https://ok.com/z", "ok.com", "ok.com")
    for i in (1, 2, 4):
        assert got[i] == (None, None, None), got[i]
    capped = cap_per_domain(df, cap=1).collect()
    # the one real domain is capped; both malformed rows survive
    assert {r["doc_id"] for r in capped} == {1, 2, 3, 4}
    assert all(r["domain"] is None for r in capped if r["doc_id"] != 3)


def _domain_parity(spark, rows, **kw):
    from spectraplex_spark.operators.urlops import (
        cap_per_domain,
        cap_per_domain_scalable,
    )

    df = spark.createDataFrame(rows, "doc_id long, url string")
    want = {
        (r["domain"], r["doc_id"]) for r in cap_per_domain(df, cap=kw["cap"]).collect()
    }
    got = {
        (r["domain"], r["doc_id"])
        for r in cap_per_domain_scalable(df, **kw).collect()
    }
    assert got == want


def test_cap_per_domain_scalable_matches_window_form(spark):
    """Two-phase hot-domain cap picks the EXACT one-window survivors:
    hot domain prefiltered by the percentile threshold, cold domains
    untouched, NULL-domain (scheme-less) rows passed through uncapped,
    and the provable-fallback path (safety too small to guarantee the
    prefilter margin) still exact."""
    rows = [
        (
            i,
            None
            if i % 50 == 7
            else f"https://{'hot.example' if i % 4 else f'cold{i % 5}.org'}/p/{i}",
        )
        for i in range(600)
    ]
    # scheme-less malformed rows → NULL domain
    rows = [(i, u if u else "no-scheme/path") for i, u in rows]
    _domain_parity(spark, rows, cap=5, hot_factor=4, safety=8)
    # fallback: accuracy=1 makes the percentile sketch nearly useless;
    # verify must catch the shortfall and restore exactness
    _domain_parity(spark, rows, cap=5, hot_factor=1, safety=1, accuracy=1)


def test_cap_per_domain_scalable_no_hot_short_circuit(spark):
    """With no domain over the hot threshold the operator degenerates
    to the plain window (plus the NULL passthrough)."""
    rows = [(i, f"https://site{i % 20}.com/p/{i}") for i in range(100)]
    _domain_parity(spark, rows, cap=3, hot_factor=64, safety=8)


def test_cap_per_domain_scalable_null_order_rows_survive(spark):
    """NULL order values sort first in the window (Spark nulls-first),
    so the one-window form keeps them — the prefilter must not drop
    them. Planted: two NULL-order rows inside the hot domain."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.urlops import (
        cap_per_domain,
        cap_per_domain_scalable,
    )

    rows = [(i, f"https://{'hot.example' if i % 4 else f'c{i % 5}.org'}/p") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, url string").withColumn(
        "doc_id",
        F.when(F.col("doc_id").isin(1, 5), F.lit(None).cast("long")).otherwise(
            F.col("doc_id")
        ),
    )
    want = {
        (r["domain"], r["doc_id"]) for r in cap_per_domain(df, cap=5).collect()
    }
    got = {
        (r["domain"], r["doc_id"])
        for r in cap_per_domain_scalable(df, cap=5, hot_factor=4, safety=8).collect()
    }
    assert got == want
    assert ("hot.example", None) in got  # the planted NULL-order survivors

"""E4 URL canonicalization + per-domain policy for LLM-data pipelines
(the RefinedWeb/C4-style web-curation stage; driver-mandated extension,
SURVEY §2.11 — the reference has no web-curation surface).

Web-scale corpora key almost everything on the URL: exact URL dedup
needs a canonical form (tracking params, host case, default ports and
``www.`` all vary across crawls of the same page), and per-domain caps
stop any single site from dominating the training mix.

``canonicalize_url`` applies, in order:

  1. scheme and host lowercased; ``www.`` prefix dropped
  2. fragment (``#...``) dropped
  3. default ports dropped (``:80`` for http, ``:443`` for https;
     non-default ports kept)
  4. tracking query params dropped (``utm_*`` prefix and the exact
     keys in ``TRACKING_PARAMS``), remaining params SORTED so
     ``?b=2&a=1`` and ``?a=1&b=2`` collide; empty query → no ``?``
  5. trailing ``/`` dropped from non-root paths; empty path → ``/``

Every step is a deterministic string/array expression with an exact
DuckDB twin (plans/ext.py registers the twin SQL), so canonical-URL
dedup bit-grades. ``registered_domain`` is the last-two-labels
heuristic — a real deployment swaps in the public-suffix list via a
broadcast lookup table; the heuristic is documented rather than hidden.

100 TB shape: canonicalization is a zero-shuffle projection;
``cap_per_domain`` is one window shuffle keyed by domain (same shape as
``textops.cap_per_source``, whose hot-key two-phase variant applies
here unchanged when a domain holds billions of pages).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, Window

from spectraplex_spark.operators.textops import fold_case, let1

# Exact-match tracking keys dropped from query strings (plus any key
# with the utm_ prefix). Keep this list sorted and mirrored in the
# DuckDB twin.
TRACKING_PARAMS = ["fbclid", "gclid", "mc_cid", "mc_eid", "ref"]


def _param_key(p: Column) -> Column:
    """The key part of a ``k=v`` query param (the whole token when
    there is no ``=``)."""
    return F.split_part(p, F.lit("="), F.lit(1))


def _is_tracking(p: Column) -> Column:
    k = _param_key(p)
    return k.startswith("utm_") | k.isin(TRACKING_PARAMS)


def percent_decode_unreserved(s: Column) -> Column:
    """Decode ``%XX`` escapes of RFC 3986 UNRESERVED characters only
    (ALPHA / DIGIT / ``-._~``) — ``%7Euser`` and ``~user`` must
    collide, while reserved escapes like ``%2F`` stay encoded (decoding
    them would change the URL's structure). Malformed escapes (``%G1``,
    trailing ``%``) pass through verbatim.

    Split on ``%``: every piece after the first was preceded by one
    ``%``; a piece opening with two hex digits whose value is
    unreserved gets that prefix replaced by the decoded char, any other
    piece gets its ``%`` restored — so ``%%41`` correctly yields
    ``%A``. Pure expression (split + transform + conv/char), exact
    DuckDB twin via strpos arithmetic."""
    parts = F.split(s, "%")

    def dec(piece: Column) -> Column:
        v = F.conv(F.substring(piece, 1, 2), 16, 10).cast("int")
        unreserved = (
            ((v >= 48) & (v <= 57))
            | ((v >= 65) & (v <= 90))
            | ((v >= 97) & (v <= 122))
            | v.isin(45, 46, 95, 126)  # - . _ ~
        )
        hexish = piece.rlike("^[0-9A-Fa-f]{2}")
        ok = hexish & unreserved
        return (
            F.when(ok, F.concat(F.char(v), F.substring(piece, 3, 2147483647)))
            # KEPT (reserved) escapes canonicalize their hex to upper
            # case — RFC 3986 6.2.2.1 says escape hex is
            # case-insensitive, so %2f and %2F must land in one dedup
            # group (review finding r13)
            .when(
                hexish,
                F.concat(
                    F.lit("%"),
                    F.upper(F.substring(piece, 1, 2)),
                    F.substring(piece, 3, 2147483647),
                ),
            )
            .otherwise(F.concat(F.lit("%"), piece))
        )

    # let1: bind the split array once — slice/size/get referenced it 3×
    # and each reference re-ran the split (r14 optimization round).
    return let1(
        parts,
        lambda ps: F.concat(
            F.get(ps, 0),
            F.array_join(F.transform(F.slice(ps, 2, F.size(ps) - 1), dec), ""),
        ),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string (see module docstring for the exact steps).
    Pure expression — no UDF, no shuffle."""
    # Layered let1 bindings: each derived piece (scheme/rest, hostpath/
    # query, host/path/qcanon) is bound once per row and every later
    # reference is a cheap lambda-variable read — the flat form re-ran
    # the whole upstream regex chain per reference (e.g. the port-strip
    # when-chain referenced ``host`` 3×, each re-running
    # auth-extract + fold_case + www-strip; r14 optimization round).
    def _final(x):
        scheme, host0, path0, qcanon = x["s"], x["h"], x["p"], x["q"]
        host = F.when(
            scheme == "http", F.regexp_replace(host0, r":80$", "")
        ).otherwise(
            F.when(
                scheme == "https", F.regexp_replace(host0, r":443$", "")
            ).otherwise(host0)
        )
        path = F.when(path0 == "", F.lit("/")).otherwise(path0)
        # scheme-less input has no '://' to anchor the host parse — emit
        # NULL so malformed rows stay visible instead of all collapsing
        # into a '://...' pseudo-URL with an empty host/domain
        return F.when(
            scheme != "",
            F.concat(
                scheme,
                F.lit("://"),
                host,
                path,
                F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
                    F.lit("")
                ),
            ),
        )

    def _pieces(b):
        scheme, hostpath, query = b["s"], b["hp"], b["q"]
        # userinfo is NOT part of the host: 'alice@example.com' must dedup
        # and quota-group with 'example.com' (hosts cannot contain '@', so
        # the greedy strip-to-last-@ is exact; review finding r13)
        auth = F.regexp_replace(
            F.regexp_extract(hostpath, r"^([^/]*)", 1), r"^.*@", ""
        )
        # fold_case, not bare lower(): a unicode host label containing İ
        # (U+0130) would otherwise canonicalize differently in Spark (full
        # case mapping) vs the DuckDB oracle (simple mapping).  The scheme
        # stays bare lower() — its regex admits only ASCII.
        host0 = F.regexp_replace(fold_case(auth), r"^www\.", "")
        # strip ALL trailing slashes, then restore the bare root: '/a//',
        # '/a/' and '/a' are one resource and canon(canon(u)) == canon(u)
        # (the old single-'/$' strip was non-idempotent on multi-slash
        # tails; review finding r13)
        path0 = F.regexp_replace(
            F.regexp_replace(hostpath, r"^[^/]*", ""), r"/+$", ""
        )
        qcanon = F.array_join(
            F.array_sort(
                F.filter(
                    F.split(query, "&"),
                    lambda p: (p != "") & ~_is_tracking(p),
                )
            ),
            "&",
        )
        return let1(
            F.struct(
                scheme.alias("s"),
                host0.alias("h"),
                path0.alias("p"),
                qcanon.alias("q"),
            ),
            _final,
        )

    def _split(a):
        scheme, rest = a["s"], a["r"]
        hostpath = F.regexp_replace(rest, r"\?.*$", "")
        query = F.when(
            rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
        ).otherwise(F.lit(""))
        return let1(
            F.struct(scheme.alias("s"), hostpath.alias("hp"), query.alias("q")),
            _pieces,
        )

    def _body(u):
        scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
        # Unreserved chars are never delimiters, so decoding before the
        # host/path/query split cannot change the parse.
        rest = percent_decode_unreserved(
            F.regexp_replace(
                F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
                r"#.*$",
                "",
            )
        )
        return let1(F.struct(scheme.alias("s"), rest.alias("r")), _split)

    return let1(F.trim(url), _body)


def url_host(url: Column) -> Column:
    """Lowercased host of the CANONICAL url (www./default-port free)."""
    return F.regexp_extract(canonicalize_url(url), r"^[a-z][a-z0-9+.-]*://([^/?]*)", 1)


# Embedded SUBSET of the Mozilla public-suffix list: the common
# two-label public suffixes under which registrations happen one label
# deeper (example.co.uk, not co.uk). A production deployment swaps in
# the full PSL as a broadcast lookup; the subset keeps the common
# ccSLD cases correct without shipping the 10k-line list.
PSL_MULTI_SUFFIXES = [
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "co.nz", "co.in", "co.kr", "co.za",
    "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
]


def registered_domain(url: Column) -> Column:
    """Registrable domain of the host, port stripped: last two labels,
    or last THREE when the host ends in a known two-label public
    suffix (``a.b.example.co.uk`` → ``example.co.uk``). The suffix set
    is the embedded ``PSL_MULTI_SUFFIXES`` subset — swap in the full
    public-suffix list as a broadcast table for production.

    Edge contracts (review findings r13): an EMPTY host (scheme-only
    URLs like ``file:///x``) yields NULL — not ``''`` — so malformed
    rows keep cap_per_domain's not-a-domain pass-through instead of
    forming one shared quota group; an all-numeric host is an IP
    address and is kept WHOLE (label arithmetic on ``93.184.216.34``
    would merge unrelated IP-hosted sites under ``216.34``); a
    trailing-dot FQDN (``example.com.``) drops the empty root label
    first."""
    # let1: bind the canonical host ONCE — the flat form referenced it
    # ~25× (the per-suffix exists() lambda alone re-ran the whole
    # canonicalize_url regex chain once per PSL suffix entry; r14
    # optimization round).
    def _body(h):
        def _with_labels(labels):
            n = F.size(labels)
            sfxs = F.array(*[F.lit(s) for s in PSL_MULTI_SUFFIXES])
            on_public_sfx = F.exists(
                sfxs, lambda s: h.endswith(F.concat(F.lit("."), s))
            )
            take = F.when(on_public_sfx, F.lit(3)).otherwise(F.lit(2))
            return (
                F.when(h == "", F.lit(None).cast("string"))
                .when(h.rlike(r"^[0-9.]+$"), h)  # IPv4 (and digit-only hosts)
                .when(n >= take, F.concat_ws(".", F.slice(labels, n - take + 1, take)))
                .otherwise(h)
            )

        return let1(F.split(h, r"\."), _with_labels)

    return let1(
        F.regexp_replace(
            F.regexp_replace(url_host(url), r":[0-9]+$", ""), r"\.$", ""
        ),
        _body,
    )


def normalize_idn_host(host: Column) -> Column:
    """Punycode/IDNA-normalize an internationalized host
    (``bücher.example`` → ``xn--bcher-kva.example``) so the Unicode and
    ACE spellings of one host collide. Needs real codec tables, so this
    is the one urlops step that is a (vectorized Arrow) pandas UDF
    rather than a JVM expression — apply it AFTER ASCII-host fast-path
    filtering at scale (the overwhelming majority of crawl hosts are
    ASCII and skip the Python stage entirely). Uses CPython's built-in
    ``idna`` codec per label; already-ASCII labels (including existing
    ``xn--`` ACE forms) pass through unchanged; labels the codec
    rejects are kept verbatim (canonicalization must never drop a
    host). NULL-safe."""
    @F.pandas_udf("string")
    def _idna(col: pd.Series) -> pd.Series:
        def one(h):
            if h is None:
                return None
            out = []
            for label in h.split("."):
                try:
                    enc = (
                        label
                        if label.isascii()
                        else label.encode("idna").decode("ascii")
                    )
                except UnicodeError:
                    enc = label
                out.append(enc)
            return ".".join(out)

        return col.map(one)

    return _idna(host)


def canonical_url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-URL dedup groups after canonicalization: one row per
    canonical URL with the copy count and min-id representative (the
    dedup_exact_docs discipline — only the canonical string shuffles)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col)
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("representative"),
        )
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 1000,
    order_col: str = "doc_id",
) -> DataFrame:
    """At most ``cap`` rows per registered domain, keeping the smallest
    ``order_col`` values (deterministic). One window shuffle keyed by
    domain; for pathological hot domains apply the two-phase
    pre-aggregate documented on textops.cap_per_source.

    Malformed URLs (no scheme → NULL domain) are NOT a domain: they
    pass through uncapped with domain NULL, so unrelated hosts are
    never lumped into one quota group — filter or repair them
    upstream."""
    out = df.withColumn("domain", registered_domain(F.col(url_col)))
    w = Window.partitionBy("domain").orderBy(F.col(order_col))
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .where((F.col("_rk") <= cap) | F.col("domain").isNull())
        .drop("_rk")
    )


def cap_per_domain_scalable(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 1000,
    order_col: str = "doc_id",
    hot_factor: int = 64,
    safety: int = 8,
    accuracy: int = 10000,
) -> DataFrame:
    """SCALE twin of :func:`cap_per_domain` — IDENTICAL survivors, but
    pathologically hot domains (a crawl where one site is 10% of all
    rows — the skewed window partition that stalls a 1000-executor
    job on one task) are pre-filtered BEFORE the window shuffle.

    The technique differs from ``textops.cap_per_source_scalable``
    because the ranking key differs: the source quota ranks by
    md5(id), so a hash-prefix literal is an order-prefix; this cap
    keeps the smallest RAW ``order_col`` values, so the per-domain
    prefilter threshold is an APPROXIMATE PERCENTILE of ``order_col``
    (any value ``<= thr`` is an order-prefix by construction).
    Exactness never rides on the sketch: a bounded per-domain survivor
    count PROVES >= min(cap, total) rows made it past the prefilter —
    then the cap smallest are all among them — and any failing domain
    falls back to its full complement.

    Pipeline (all sizes bounded, nothing driver-side scales with the
    corpus):
      1. per-domain counts (partial-agg); HOT = count > hot_factor*cap
         — at most N/(hot_factor*cap) domains, broadcastable;
      2. one percentile pass over ONLY hot-domain rows (broadcast
         semi-join), at 41 power-of-two fractions (percentile_approx
         needs foldable fractions, and a per-domain fraction rounded
         UP to the 2^-e grid keeps >= the targeted safety*cap rows
         while at most doubling them);
      3. narrow prefilter via a broadcast threshold join
         (order_col <= thr; cold/NULL domains pass);
      4. bounded verify + provable fallback (the cap_per_source
         discipline);
      5. the window runs over ~2*safety*cap rows per hot domain
         instead of billions.

    ``order_col`` must be numeric (percentile_approx's domain) and
    unique per row (same determinism contract as cap_per_domain).
    NULL domains (scheme-less URLs) keep cap_per_domain's contract:
    not a quota group, pass through uncapped."""
    from spectraplex_spark.operators.components import lineage_truncate

    # Canonicalize ONCE (the hash-shingles-once discipline): the
    # counts, percentile, prefilter, verify and fallback passes below
    # each reference `domain`, and Catalyst re-inlines the whole
    # interpreted URL-canonicalization chain (regex + HOF decode, no
    # CSE across projection collapse) into every consumer — measured
    # 43s -> ~3s at sf0.01 with the truncation. At 100 TB this is the
    # materialized (url, domain) table every pass re-reads; write it
    # to storage for the executor-loss-proof variant.
    out = lineage_truncate(
        df.withColumn("domain", registered_domain(F.col(url_col)))
    )
    scope = out.filter(F.col("domain").isNotNull())
    passthrough = out.filter(F.col("domain").isNull())

    w = Window.partitionBy("domain").orderBy(F.col(order_col))

    def _rank(frame):
        return (
            frame.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= cap)
            .drop("_rk")
        )

    counts = scope.groupBy("domain").agg(F.count(F.lit(1)).alias("_cnt"))
    # bounded by N/(hot_factor*cap): the *driver* only ever sees hot
    # domains, never the (unbounded) full domain list. Collected ONCE
    # so the three downstream uses (semi-join, threshold join, verify)
    # don't each recompute the counts scan.
    hot_local = counts.filter(F.col("_cnt") > hot_factor * cap).collect()
    if not hot_local:
        return _rank(scope).unionByName(passthrough)
    hot = df.sparkSession.createDataFrame(
        [(r["domain"], r["_cnt"]) for r in hot_local], "domain string, _cnt long"
    )

    grid = [float(2.0**-e) for e in range(41)]  # fractions 1 .. 2^-40
    hot_rows = scope.join(F.broadcast(hot.select("domain")), "domain", "left_semi")
    # percentile_approx rank error is ~cnt/accuracy rows: at a fixed
    # accuracy a hot-enough domain (cnt > safety*cap*accuracy) could
    # under-keep below cap and trip the full-domain fallback — the
    # exact one-task stall this function exists to avoid.  Scale the
    # accuracy so the sketch error stays below the safety margin
    # (memory is O(accuracy), ~125k at 1e9 rows/domain with defaults;
    # review finding r13).
    max_cnt = max(r["_cnt"] for r in hot_local)
    eff_accuracy = max(accuracy, -(-int(max_cnt) // (safety * cap)))
    pcts = hot_rows.groupBy("domain").agg(
        F.percentile_approx(
            F.col(order_col), F.array(*[F.lit(g) for g in grid]), eff_accuracy
        ).alias("_p")
    )
    # e = largest exponent with 2^-e >= safety*cap/cnt (rounded DOWN,
    # i.e. fraction rounded UP — the safe side), clamped to the grid
    e_idx = F.greatest(
        F.lit(0),
        F.least(
            F.lit(40),
            F.floor(F.log2(F.col("_cnt") / F.lit(float(safety * cap)))),
        ),
    ).cast("int")
    thr = (
        hot.join(pcts, "domain")
        .select(
            "domain",
            "_cnt",
            F.get(F.col("_p"), e_idx).alias("_thr"),
        )
    )

    pre = scope.join(
        F.broadcast(thr.select("domain", "_thr")), "domain", "left"
    )
    # NULL order values sort FIRST under the window's ascending order
    # (Spark nulls-first), so the one-window form keeps them among the
    # cap smallest — the prefilter must pass them through too (a bare
    # `order <= thr` is NULL for them and would silently drop rows the
    # twin keeps).
    survivors = pre.filter(
        F.col("_thr").isNull()
        | (F.col(order_col) <= F.col("_thr"))
        | F.col(order_col).isNull()
    )
    got = (
        survivors.filter(F.col("_thr").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("_got"))
    )
    bad = (
        thr.join(got, "domain", "left")
        .filter(
            F.coalesce(F.col("_got"), F.lit(0))
            < F.least(F.lit(cap).cast("long"), F.col("_cnt"))
        )
        .select("domain", "_thr")
        .collect()  # bounded: one row per FAILING hot domain (≈ never)
    )
    survivors = survivors.drop("_thr")
    if bad:  # provable fallback, not a retry loop
        bad_df = df.sparkSession.createDataFrame(
            [(r["domain"], r["_thr"]) for r in bad], thr.select("domain", "_thr").schema
        )
        fb = (
            scope.join(F.broadcast(bad_df), "domain")
            .filter(F.col(order_col) > F.col("_thr"))
            .drop("_thr")
        )
        survivors = survivors.unionByName(fb)
    return _rank(survivors).unionByName(passthrough)

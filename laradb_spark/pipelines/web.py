"""URL/domain-level web-curation operators — the stage a CommonCrawl-style
pipeline runs BEFORE text extraction (RefinedWeb, Penedo et al. 2023 §3.1:
URL filtering; C4/Gopher apply domain blocklists and per-domain caps), and
the one family the corpus-level text operators here previously lacked.

Four shapes:

* :func:`canonical_url` / :func:`url_canonicalize` — deterministic URL
  normalization (an RFC 3986 normalization subset plus tracking-param
  stripping, spelled out below) as a pure whole-stage-codegen expression:
  lowercase scheme+host, drop the fragment, drop default ports (http:80 /
  https:443), drop a leading ``www.``, collapse an empty path to ``/`` and
  strip one trailing slash elsewhere, drop tracking params
  (``utm_*``/``fbclid``/``gclid``/``msclkid``/``ref``), sort the remaining
  query params. Strings without a ``scheme://`` prefix pass through
  unchanged with an empty domain (they are not URLs; dropping them is the
  caller's policy decision, not the normalizer's).
* :func:`drop_exact_url_duplicates` — exact dedup on the CANONICAL url
  (keep min id), the URL twin of ``dedup.drop_exact_duplicates``.
* :func:`url_index_build` / :func:`drop_seen_urls` — the stored-index
  incremental variant (``dedup.digest_build_index`` pattern): history is a
  distinct canonical-url-digest parquet; new shards screen with a
  stream-static left-anti join (same file-listing caveat).
* domain blocklist / frequency caps — :func:`domain_blocklist_filter` is
  an ``isin`` scan filter for literal lists (pushed down) or a broadcast
  anti-join for a blocklist DataFrame; per-domain caps are
  ``curation.cap_per_group(df, "domain", k)`` over the
  :func:`url_canonicalize` output (deliberately not re-implemented here).

100 TB shape: canonicalization is a zero-shuffle projection (regex + array
ops only, no UDF); dedup is one digest-keyed aggregate with map-side
combine (the digest is md5 of the canonical form — fixed-width shuffle
key, no raw URLs in the exchange); the blocklist is either a pushed scan
predicate or a broadcast; caps use the two-phase grouped rank (domain
cardinality is usually ≫ cores, so callers may pass ``two_phase=False`` —
see ``cap_per_group``).

Reference parity note: the reference engine has no web/URL surface (its
ingest is CSV/triple files, `SensorFileAction.kt:163`,
`TripleFileWriter.kt:21`); this family is beyond-reference LLM-pipeline
surface, same tier as the line/dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
#: tracking params stripped during canonicalization (name match, value-free
#: params included via (=|$))
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module-docstring rules, as a
    single codegen expression. NULL-safe (NULL → '')."""
    u = F.coalesce(url, F.lit(""))
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(nofrag, _SCHEME_RE + r"([^/?#]*)", 2))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(nofrag, _SCHEME_RE + r"[^/?#]*([^?]*)", 2)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "(.)/$", "$1")
    )
    rawq = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, query)
    )


def url_domain(url: Column) -> Column:
    """The canonical domain (lowercase host, default port and leading
    ``www.`` stripped); '' for non-URL strings."""
    u = F.coalesce(url, F.lit(""))
    nofrag = F.regexp_replace(u, "#.*$", "")
    hostport = F.lower(F.regexp_extract(nofrag, _SCHEME_RE + r"([^/?#]*)", 2))
    host = F.regexp_replace(F.regexp_replace(hostport, ":(80|443)$", ""), r"^www\.", "")
    return host


def url_canonicalize(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``canonical_url`` and ``domain`` columns — the zero-shuffle
    projection every downstream URL operator keys on."""
    return df.withColumns(
        {
            "canonical_url": canonical_url(F.col(url_col)),
            "domain": url_domain(F.col(url_col)),
        }
    )


def exact_url_duplicates(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """One row per canonical-URL cluster: ``(digest, keep_id, n_copies)``
    — md5 of the canonical form so the exchange carries a fixed-width key,
    never raw URLs (the ``exact_duplicates`` discipline)."""
    return (
        df.select(
            F.md5(canonical_url(F.col(url_col))).alias("digest"), F.col(id_col)
        )
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def drop_exact_url_duplicates(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """df minus rows whose canonical URL was already claimed by a lower
    id (keeps min id per canonical URL)."""
    keep = exact_url_duplicates(df, id_col, url_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def url_index_build(df: DataFrame, path: str, url_col: str = "url") -> None:
    """Materialize the corpus's distinct canonical-URL digest set as
    parquet ``(digest)`` — the frozen half of incremental URL dedup
    (``digest_build_index`` twin). Append accepted shards' digests with
    ``url_index_update``."""
    (
        df.select(F.md5(canonical_url(F.col(url_col))).alias("digest"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def url_index_update(df: DataFrame, path: str, url_col: str = "url") -> None:
    """Append one shard's distinct canonical-URL digests to a stored URL
    index (``mode='append'`` twin of :func:`url_index_build`). Holds the
    index's single-writer lock like every index mutator (r15)."""
    from ..streaming.txn import writer_lock

    with writer_lock(path, "url_index_update"):
        (
            df.select(F.md5(canonical_url(F.col(url_col))).alias("digest"))
            .distinct()
            .write.mode("append")
            .parquet(path)
        )


def drop_seen_urls(df: DataFrame, index_path: str, url_col: str = "url") -> DataFrame:
    """Drop rows whose canonical URL digest already exists in the stored
    index — incremental URL dedup of a new shard against history. Batch
    and streaming alike (stream-static left-anti join; the
    ``drop_seen_digests`` file-listing caveat applies verbatim). Rows
    duplicated WITHIN the new shard are not each other's history — run
    :func:`drop_exact_url_duplicates` on the survivors for that."""
    seen = df.sparkSession.read.parquet(index_path)
    return (
        df.withColumn("_digest", F.md5(canonical_url(F.col(url_col))))
        .join(seen.withColumnRenamed("digest", "_digest"), on="_digest", how="left_anti")
        .drop("_digest")
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked: list[str] | DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose canonical domain is blocklisted. A literal list
    becomes an ``isin`` predicate (pushed into the scan); a DataFrame
    blocklist (column ``domain``) becomes a left-anti join — blocklists
    are human-curated and tiny, so AQE broadcasts it."""
    dom = url_domain(F.col(url_col))
    if isinstance(blocked, DataFrame):
        return (
            df.withColumn("_dom", dom)
            .join(
                blocked.select(F.col("domain").alias("_dom")).distinct(),
                on="_dom",
                how="left_anti",
            )
            .drop("_dom")
        )
    return df.filter(~dom.isin(*blocked))


# ---------------------------------------------------------------------------
# markup text extraction (the WET step: raw HTML-ish payload → clean text)
# ---------------------------------------------------------------------------

#: extraction passes, in order. Literal-shared with the SQL oracle; every
#: pattern stays in the RE2 ∩ Java dialect ((?is) inline flags, non-greedy
#: quantifiers, explicit classes — no lookaround, no backrefs).
HTML_STRIP_PASSES: tuple[tuple[str, str], ...] = (
    # script/style/comment CONTENT is payload, not prose — drop whole blocks
    # (unterminated blocks drop to end-of-doc, matching browser behavior)
    (r"(?is)<script\b.*?(</script>|$)", " "),
    (r"(?is)<style\b.*?(</style>|$)", " "),
    (r"(?s)<!--.*?(-->|$)", " "),
    # every remaining tag is a word boundary
    (r"(?s)<[^>]*>", " "),
)

#: entity decodes applied AFTER tag stripping; ``&amp;`` decodes LAST so
#: double-encoded text does not double-decode (the standard ordering).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(markup: Column) -> Column:
    """Clean prose from an HTML-ish payload — the WET-extraction step
    between URL curation and the text-quality family (C4 §2.1 starts
    from exactly this): drop script/style/comment blocks, break on tags,
    decode the six ubiquitous entities, collapse whitespace runs to one
    space, trim. A deliberately rule-based extractor (the
    trafilatura/jusText DOM walk needs an HTML parser — out of scope and
    out of container); NULL-safe, zero-shuffle, whole-stage codegen, and
    every pass is a shared literal the SQL oracle replays verbatim."""
    s = F.coalesce(markup, F.lit(""))
    for pat, rep in HTML_STRIP_PASSES:
        s = F.regexp_replace(s, pat, rep)
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"[ \t\r\n]+", " "))


def html_extract(
    df: DataFrame, markup_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Apply :func:`extract_text`, keeping all other columns; adds
    ``had_markup`` (the payload contained at least one tag/entity —
    cheap triage for routing mixed plain-text/HTML corpora)."""
    raw = F.coalesce(F.col(markup_col), F.lit(""))
    had = raw.rlike(r"<[^>]*>|&(lt|gt|quot|amp|nbsp|#39);")
    others = [c for c in df.columns if c != markup_col]
    return df.select(
        *others,
        extract_text(F.col(markup_col)).alias(out_col),
        had.alias("had_markup"),
    )

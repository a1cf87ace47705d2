"""Line-structure curation operators — the line-granular half of web-scale
text cleaning that :mod:`.text`'s token-granular rules deliberately left
out (``gopher_quality_flags`` docstring: "line-based rules ... are
omitted").

Three public shapes, each citing its published rule set:

* :func:`c4_line_clean` — C4's line filter (Raffel et al. 2020 §2.2):
  keep lines that end in terminal punctuation and carry ≥ ``min_words``
  words; drop whole documents containing a bad word, ``lorem ipsum``, or
  a ``{``, or with fewer than ``min_lines`` surviving lines.
* :func:`corpus_line_dedup` — RefinedWeb-style corpus-level repeated-line
  removal (Penedo et al. 2023): a non-blank line occurring more than
  ``max_occurrences`` times across the corpus is boilerplate (nav bars,
  cookie banners) and is stripped from every document.
* :func:`line_profile` — the Gopher line rules (Rae et al. 2021 §A1):
  per-document bullet-start and ellipsis-end line fractions with the
  published drop thresholds (>90 % bullet starts, >30 % ellipsis ends).

Reference parity note: the reference engine has no line operators — its
text surface is the WordCount tokenizer (`WordCountQuery.kt:33`); this
family is beyond-reference LLM-pipeline surface, same tier as the dedup/
DSIR/Gopher token rules.

100 TB shape: ``c4_line_clean`` and ``line_profile`` are PURE PER-ROW
PROJECTIONS — the lines array is split once and every rule is an array
higher-order function over it, so the plan is a single embarrassingly
parallel scan with no shuffle, no UDF, and full filter pushdown below it.
Only ``corpus_line_dedup`` carries corpus state: one (line-hash → count)
aggregate with map-side combine over the exploded line stream, the heavy
subset joined back (AQE broadcasts it when small — the usual case: only
lines duplicated ``> max_occurrences`` times survive the HAVING), and one
per-doc reassembly aggregate. Integer ppm arithmetic throughout
(DEVNOTES gotcha #4: no float ratios near hash compares).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import fan_out, persist_once

# C4 keeps a line only when it ends in terminal punctuation. Raffel et
# al. 2020 §2.2: "we only retained lines that ended in a terminal
# punctuation mark (i.e. a period, exclamation mark, question mark, or
# end quotation mark)".
TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_WORDS = 5     # "only retained lines that contained at least 5 words"
C4_MIN_LINES = 3     # "discarded any page with fewer than 3 sentences"
# Placeholder for the public "List of Dirty, Naughty, Obscene..." list C4
# cites; callers pass their own. Matching is exact lowercase whitespace-token
# membership (no substring matches — "class" must not trip on "ass").
DEFAULT_BADWORDS = ("badword",)

# Gopher §A1 line-rule thresholds, in ppm.
GOPHER_MAX_BULLET_START_PPM = 900_000   # drop if >90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_END_PPM = 300_000   # drop if >30% of lines end with an ellipsis
BULLET_PREFIXES = ("- ", "* ", "• ")
ELLIPSIS_SUFFIXES = ("...", "…")


def _lines(text_col: Column) -> Column:
    """NULL-safe split of a document into its lines. ``split('')`` is
    ``['']`` on both engines (DuckDB ``string_split``), so an empty doc
    has exactly one blank line — the parity convention every operator
    and oracle in this module shares."""
    return F.split(F.coalesce(text_col, F.lit("")), "\n")


def _line_word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(line, " "), lambda w: w != ""))


def _c4_keep(line: Column, min_words: int) -> Column:
    punct = [line.endswith(p) for p in TERMINAL_PUNCT]
    ends_ok = punct[0]
    for p in punct[1:]:
        ends_ok = ends_ok | p
    return ends_ok & (_line_word_count(line) >= min_words)


def c4_line_clean(
    df: DataFrame,
    min_words: int = C4_MIN_WORDS,
    min_lines: int = C4_MIN_LINES,
    badwords: tuple[str, ...] = DEFAULT_BADWORDS,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) →
    ``(id, clean_text, n_lines, n_lines_kept)`` for surviving documents.

    Line rule: keep a line iff it ends in one of ``TERMINAL_PUNCT`` AND
    has ≥ ``min_words`` whitespace words. Document rules (any one drops
    the whole doc, evaluated on the ORIGINAL text): a lowercase
    whitespace token equal to a ``badwords`` entry; the substring
    ``lorem ipsum`` (lowercased); a ``{`` character (C4's javascript
    tell); or fewer than ``min_lines`` surviving lines.

    Plan: one projection computing the lines array once, HOF filter for
    the kept lines, scalar doc flags, one filter — a single
    shuffle-free scan (see module docstring). Dropped documents are
    absent from the output (the ``quality_classifier_score``
    keep-frame discipline)."""
    # Heavy per-row map: full-text lower+split+arrays_overlap plus an
    # interpreted HOF filter per line — fan the scan out so one small
    # parquet file does not run the whole stream in ONE task (r16: the
    # 8-vs-32-core scaling probe measured this query at ratio 1.02, i.e.
    # serial; util.fan_out's gate makes this a no-op at corpus scale).
    df = fan_out(df)
    lw = F.lower(F.col(text))
    # Split on the [ \n] whitespace CLASS, not ' ' alone: with a
    # space-only split, the last word of one line and the first word of
    # the next fuse into one token ('prev.\nbadword') and a badword at
    # line start is never detected (round-8 ADVICE item).
    bad_tok = F.arrays_overlap(
        F.split(lw, "[ \n]"), F.array(*[F.lit(b) for b in badwords])
    )
    doc_ok = (
        ~F.coalesce(bad_tok, F.lit(False))
        & ~lw.contains("lorem ipsum")
        & ~F.col(text).contains("{")
    )
    staged = df.select(
        F.col(id_col),
        doc_ok.alias("_doc_ok"),
        _lines(F.col(text)).alias("_lines"),
    ).select(
        id_col,
        "_doc_ok",
        F.size("_lines").alias("n_lines"),
        F.filter("_lines", lambda ln: _c4_keep(ln, min_words)).alias("_kept"),
    )
    return staged.select(
        id_col,
        F.array_join("_kept", "\n").alias("clean_text"),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_lines_kept"),
        "_doc_ok",
    ).filter(F.col("_doc_ok") & (F.col("n_lines_kept") >= min_lines)).drop("_doc_ok")


def line_stream(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded ``(id, ln, line, _h)`` line stream, md5-keyed. Public so
    callers that manage their own caching (the streaming ingest loop,
    which would otherwise leak one cached plan per micro-batch) can
    build it once, ``persist()`` it, pass it to
    :func:`strip_indexed_lines` / :func:`line_index_update` via their
    ``lines=`` parameter, and ``unpersist()`` in a ``finally``."""
    return (
        fan_out(df)
        .select(F.col(id_col), F.posexplode(_lines(F.col(text))).alias("ln", "line"))
        .withColumn("_h", F.md5(F.col("line")))
    )


def _line_stream(df: DataFrame, text: str, id_col: str) -> DataFrame:
    return line_stream(df, text, id_col)


def _strip_heavy(ls: DataFrame, heavy: DataFrame, id_col: str) -> DataFrame:
    """Remove the heavy-hash lines from the stream and reassemble each
    doc → ``(id, clean_text, n_lines, n_lines_removed)``. One per-doc
    aggregate ordered by line position (conditional ``collect_list`` —
    ``when()`` yields NULL for removed lines and collect_list drops
    NULLs)."""
    flagged = ls.join(heavy.withColumn("_rm", F.lit(True)), on="_h", how="left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_rm"), 1).otherwise(0)).cast("long").alias("n_lines_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_rm").isNull(), F.struct("ln", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(id_col, "clean_text", "n_lines", "n_lines_removed")
    )


def corpus_line_dedup(
    df: DataFrame,
    max_occurrences: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    lines: DataFrame | None = None,
) -> DataFrame:
    """RefinedWeb-style corpus-level line dedup (Penedo et al. 2023):
    strip every NON-BLANK line whose exact text occurs more than
    ``max_occurrences`` times across the corpus (cookie banners, nav
    boilerplate) → ``(id, clean_text, n_lines, n_lines_removed)`` for
    every input document (a doc whose every line is boilerplate comes
    back with ``clean_text = ''``). Blank lines are structural, never
    counted or removed.

    Scale shape: lines shuffle by ``md5(line)`` (narrow fixed-width key,
    map-side combine; full 128-bit digest so collisions are not a
    correctness concern at 10^12 lines, unlike a 64-bit prefix); the
    HAVING keeps only genuinely repeated lines, so the heavy set is
    boilerplate-sized and AQE broadcasts the join back; one per-doc
    reassembly aggregate ordered by line position (``_strip_heavy``).
    ``lines`` optionally supplies a pre-built (caller-persisted)
    :func:`line_stream`."""
    ls = lines if lines is not None else _line_stream(df, text, id_col)
    heavy = (
        ls.filter(F.col("line") != "")
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > max_occurrences)
        .select("_h")
    )
    return _strip_heavy(ls, heavy, id_col)


def line_index_build(
    df: DataFrame, path: str, text: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the corpus's per-line-hash occurrence COUNTS as
    parquet ``(h, n)`` — the frozen half of INCREMENTAL line dedup
    (the ``span_build_index`` pattern, but with counts instead of a
    seen-set: a line is boilerplate only once its CUMULATIVE count
    crosses the threshold, so the index must add across shards).
    Append further shards with :func:`line_index_update`; readers sum
    per hash, so appended part files never need compaction to be
    correct. Blank lines are structural and never indexed."""
    (
        _line_stream(df, text, id_col)
        .filter(F.col("line") != "")
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(path)
    )


def line_index_update(
    df: DataFrame,
    path: str,
    text: str = "text",
    id_col: str = "doc_id",
    lines: DataFrame | None = None,
) -> None:
    """Append one shard's per-line-hash counts to a stored line index
    (``mode='append'`` twin of :func:`line_index_build`). ``lines``
    optionally supplies a pre-built (often pre-persisted)
    :func:`line_stream` to avoid re-exploding ``df``. Holds the index's
    single-writer lock like every index mutator (r15)."""
    from ..streaming.txn import writer_lock

    with writer_lock(path, "line_index_update"):
        (
            (lines if lines is not None else _line_stream(df, text, id_col))
            .filter(F.col("line") != "")
            .groupBy(F.col("_h").alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(path)
        )


def strip_indexed_lines(
    df: DataFrame,
    index_path: str,
    max_occurrences: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    lines: DataFrame | None = None,
) -> DataFrame:
    """Incremental :func:`corpus_line_dedup` against history: strip every
    line whose CUMULATIVE count — stored index (all prior shards) PLUS
    this batch — exceeds ``max_occurrences``. A cookie banner that was
    seen ``max_occurrences`` times in history is stripped from every new
    document that carries it; a batch-internal flood crosses the
    threshold even with no history. Same output contract as
    ``corpus_line_dedup``.

    Scale shape: the index aggregates to one count per DISTINCT line
    hash (boilerplate-vocabulary-sized, shrinking under map-side
    combine no matter how many appended part files), joins the batch's
    own counts, and only then filters heavy — the batch's line stream
    shuffles once, the heavy set broadcasts back (AQE).

    ``lines`` optionally supplies a pre-built :func:`line_stream` whose
    persistence the CALLER manages (streaming loops must, or each
    micro-batch leaks one cached plan); when omitted, the stream is
    ``persist_once``-cached for this one-shot query."""
    spark = df.sparkSession
    ls = lines if lines is not None else persist_once(_line_stream(df, text, id_col))
    batch_counts = (
        ls.filter(F.col("line") != "")
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hist = (
        spark.read.parquet(index_path)
        .groupBy("h")
        .agg(F.sum("n").alias("n_hist"))
    )
    heavy = (
        batch_counts.join(hist, on="h", how="left")
        .filter(
            F.col("n") + F.coalesce(F.col("n_hist"), F.lit(0)) > max_occurrences
        )
        .select(F.col("h").alias("_h"))
    )
    return _strip_heavy(ls, heavy, id_col)


def line_profile(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher line rules (Rae et al. 2021 §A1) → per-document
    ``(id, n_lines, bullet_start_ppm, ellipsis_end_ppm, dup_line_ppm,
    dup_line_char_ppm, flag_bullet, flag_ellipsis)``. A doc flags when
    >90 % of its lines start with a bullet (``- ``, ``* ``, ``• ``) or
    >30 % end with an ellipsis (``...`` or ``…``) — the published drop
    thresholds, as integer ppm (``div`` — gotcha #4). The dup columns
    are Gopher's WITHIN-doc repetition signals at line granularity
    (§A1.2 "duplicate line fraction" / "duplicate line character
    fraction"): the ppm of non-blank lines that are repeats of an
    earlier identical line, and the ppm of non-blank-line characters
    inside those repeats (denominators: non-blank lines / their total
    chars; 0 when a doc has none). Complements
    :func:`corpus_line_dedup`, which is the ACROSS-doc version. Pure
    per-row projection: lines split once, HOF counts only, zero
    shuffle."""

    def starts_bullet(ln: Column) -> Column:
        out = ln.startswith(BULLET_PREFIXES[0])
        for p in BULLET_PREFIXES[1:]:
            out = out | ln.startswith(p)
        return out

    def ends_ellipsis(ln: Column) -> Column:
        out = ln.endswith(ELLIPSIS_SUFFIXES[0])
        for s in ELLIPSIS_SUFFIXES[1:]:
            out = out | ln.endswith(s)
        return out

    def chars(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, ln: acc + F.length(ln)
        )

    staged = (
        df.select(F.col(id_col), _lines(F.col(text)).alias("_lines"))
        .withColumn("_nblines", F.filter("_lines", lambda ln: ln != ""))
        .select(
            id_col,
            F.size("_lines").cast("long").alias("n_lines"),
            F.size(F.filter("_lines", starts_bullet)).alias("_nb"),
            F.size(F.filter("_lines", ends_ellipsis)).alias("_ne"),
            F.size("_nblines").alias("_nnb"),
            F.size(F.array_distinct("_nblines")).alias("_ndist"),
            chars(F.col("_nblines")).alias("_nbchars"),
            chars(F.array_distinct("_nblines")).alias("_distchars"),
        )
    )
    bullet_ppm = F.expr("(1000000 * _nb) div n_lines")
    ellipsis_ppm = F.expr("(1000000 * _ne) div n_lines")
    dup_ppm = F.expr(
        "CASE WHEN _nnb > 0 THEN (1000000 * (_nnb - _ndist)) div _nnb ELSE CAST(0 AS BIGINT) END"
    )
    dup_char_ppm = F.expr(
        "CASE WHEN _nbchars > 0 THEN (1000000 * (_nbchars - _distchars)) div _nbchars ELSE CAST(0 AS BIGINT) END"
    )
    return staged.select(
        id_col,
        "n_lines",
        bullet_ppm.alias("bullet_start_ppm"),
        ellipsis_ppm.alias("ellipsis_end_ppm"),
        dup_ppm.alias("dup_line_ppm"),
        dup_char_ppm.alias("dup_line_char_ppm"),
        (bullet_ppm > GOPHER_MAX_BULLET_START_PPM).alias("flag_bullet"),
        (ellipsis_ppm > GOPHER_MAX_ELLIPSIS_END_PPM).alias("flag_ellipsis"),
    )

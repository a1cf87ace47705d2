"""Line-structure operators (pipelines/lines.py): C4 line cleaning,
RefinedWeb corpus-level line dedup, Gopher line profile — semantics
against hand-computed documents with real newline structure (the
registry queries fabricate lines from the flat synthetic corpus; these
tests exercise the operators on native multi-line text), plus the
shuffle-free plan contract for the two pure-projection operators."""

import pytest
from pyspark.sql import functions as F

from laradb_spark.pipelines import lines as li


@pytest.fixture(scope="module")
def lined(spark):
    rows = [
        # doc 1: mixed keep/drop lines — survives C4
        (1, "the quick brown fox jumps high today.\nno punct line here at all\nshort one.\nanother good long line with punctuation!\nis this a question with enough words?"),
        # doc 2: enough sentences but contains a { → doc-dropped
        (2, "function () { return 1; }\na perfectly fine long sentence right here.\nand a second fine long sentence too.\nand a third fine long sentence also."),
        # doc 3: lorem ipsum substring → doc-dropped
        (3, "Lorem Ipsum dolor sit amet consectetur.\nsecond decent sentence with many words inside.\nthird decent sentence with many words inside.\nfourth decent sentence with many words inside."),
        # doc 4: badword token → doc-dropped
        (4, "BADWORD appears right at this spot.\nsecond decent sentence with many words inside.\nthird decent sentence with many words inside.\nfourth decent sentence with many words inside."),
        # doc 5: only 2 kept lines → dropped by min_lines
        (5, "good long sentence number one right here.\ngood long sentence number two right here.\nbut this line has no terminal punctuation"),
        # doc 6: empty text → one blank line, 0 kept → dropped
        (6, ""),
        # doc 7: NULL text → same as empty
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_clean_semantics(spark, lined):
    got = {r.doc_id: r for r in li.c4_line_clean(lined).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r.n_lines == 5
    assert r.n_lines_kept == 3  # "short one." has < 5 words; bare line has no punct
    assert r.clean_text == (
        "the quick brown fox jumps high today.\n"
        "another good long line with punctuation!\n"
        "is this a question with enough words?"
    )


def test_c4_badword_is_token_exact_not_substring(spark):
    # "class" must not trip a badword "ass"; a real "ass" token must.
    df = spark.createDataFrame(
        [
            (1, "the class has five students in it today.\nsecond long line ends with a period.\nthird long line ends with a period."),
            (2, "the ass walked over the green hill today.\nsecond long line ends with a period.\nthird long line ends with a period."),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in li.c4_line_clean(df, badwords=("ass",)).collect()}
    assert got == {1}


def test_corpus_line_dedup_semantics(spark):
    banner = "accept all cookies to continue"
    rows = [
        (1, f"{banner}\nunique first body line\n\n{banner}"),
        (2, f"{banner}\nunique second body line"),
        (3, f"{banner}\nunique third body line"),
        (4, "\n\n"),  # only blank lines — never removed
        (5, banner),  # becomes empty after dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in li.corpus_line_dedup(df, max_occurrences=2).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # banner occurs 5 times (> 2) → stripped everywhere; blanks survive
    assert got[1].clean_text == "unique first body line\n"
    assert (got[1].n_lines, got[1].n_lines_removed) == (4, 2)
    assert got[2].clean_text == "unique second body line"
    assert got[2].n_lines_removed == 1
    assert got[4].clean_text == "\n\n"
    assert got[4].n_lines_removed == 0
    assert got[5].clean_text == ""
    assert (got[5].n_lines, got[5].n_lines_removed) == (1, 1)


def test_corpus_line_dedup_threshold_boundary(spark):
    # a line occurring EXACTLY max_occurrences times stays
    rows = [(1, "twice line"), (2, "twice line"), (3, "solo line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text for r in li.corpus_line_dedup(df, max_occurrences=2).collect()}
    assert got == {1: "twice line", 2: "twice line", 3: "solo line"}


def test_line_profile_semantics(spark):
    rows = [
        (1, "- a\n- b\n- c\n* d\nplain"),            # 4/5 bullets = 800000 ppm
        (2, "- a\n• b\n- c\n- d\n- e\nwait...\nx…"),  # 5/7 bullet, 2/7 ellipsis
        (3, "all ten of these lines start with bullets\n- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in li.line_profile(df).collect()}
    r1 = got[1]
    assert (r1.n_lines, r1.bullet_start_ppm, r1.ellipsis_end_ppm) == (5, 800000, 0)
    assert (r1.flag_bullet, r1.flag_ellipsis) is not None
    assert not r1.flag_bullet and not r1.flag_ellipsis
    r2 = got[2]
    assert r2.bullet_start_ppm == 5 * 1_000_000 // 7
    assert r2.ellipsis_end_ppm == 2 * 1_000_000 // 7
    assert not r2.flag_bullet and not r2.flag_ellipsis  # 714285 ≤ 900000
    r3 = got[3]
    assert r3.bullet_start_ppm == 900000  # 9/10 — boundary is NOT a flag (strict >)
    assert not r3.flag_bullet
    r4 = got[4]
    assert (r4.n_lines, r4.bullet_start_ppm, r4.flag_bullet) == (1, 0, False)


def test_line_profile_within_doc_dup_lines(spark):
    rows = [
        # 4 non-blank lines: "dup" ×3 (3 chars each) + "unique nine" (11);
        # repeats = 2 lines, 6 chars of 20 total. Blank lines excluded
        # from BOTH denominators.
        (1, "dup\n\ndup\ndup\nunique nine"),
        (2, "a\nb\nc"),          # no repeats
        (3, "\n\n"),              # only blanks → both ppm 0, no div-by-zero
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in li.line_profile(df).collect()}
    r1 = got[1]
    assert r1.dup_line_ppm == 2 * 1_000_000 // 4
    assert r1.dup_line_char_ppm == 6 * 1_000_000 // 20
    assert got[2].dup_line_ppm == 0 and got[2].dup_line_char_ppm == 0
    assert got[3].dup_line_ppm == 0 and got[3].dup_line_char_ppm == 0


def test_projection_ops_are_shuffle_free(spark, lined):
    # c4_line_clean and line_profile must plan as a bare scan+project —
    # no Exchange anywhere (the module's 100 TB contract).
    for op in (li.c4_line_clean, li.line_profile):
        plan = op(lined)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_strip_indexed_lines_cumulative_threshold(spark, tmp_path):
    """Incremental line dedup: a line crosses the boilerplate threshold
    via history alone, via the batch alone, or via history+batch
    combined; novel and blank lines survive."""
    banner = "accept cookies now"
    hist = spark.createDataFrame(
        [(1, f"{banner}\nhist one"), (2, f"{banner}\nhist two"), (3, f"{banner}\nhist three"),
         (4, "seen once in history\nfiller")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lidx")
    li.line_index_build(hist, idx)

    batch = spark.createDataFrame(
        [
            (10, f"{banner}\nnovel body ten"),          # heavy via history (3 > 2)
            (11, "flood\nflood\nflood\nnovel eleven"),  # heavy via batch alone
            (12, "seen once in history\nseen once in history\nnovel twelve"),  # 1 hist + 2 batch > 2
            (13, "novel thirteen\n\nnovel thirteen tail"),  # untouched, blank kept
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in li.strip_indexed_lines(batch, idx, max_occurrences=2).collect()}
    assert got[10].clean_text == "novel body ten" and got[10].n_lines_removed == 1
    assert got[11].clean_text == "novel eleven" and got[11].n_lines_removed == 3
    assert got[12].clean_text == "novel twelve" and got[12].n_lines_removed == 2
    assert got[13].clean_text == "novel thirteen\n\nnovel thirteen tail"
    assert got[13].n_lines_removed == 0

    # appending the batch via line_index_update makes its lines history:
    # a later shard carrying "flood" once now crosses 3(+1) > 2
    li.line_index_update(batch, idx)
    later = spark.createDataFrame([(20, "flood\nnovel twenty")], "doc_id long, text string")
    got2 = {r.doc_id: r for r in li.strip_indexed_lines(later, idx, max_occurrences=2).collect()}
    assert got2[20].clean_text == "novel twenty" and got2[20].n_lines_removed == 1


def test_line_ingest_loop_strips_across_and_within_batches(spark, tmp_path):
    """line_ingest_stream: a banner line accumulating across micro-batches
    is stripped once its cumulative count crosses the threshold; within-
    batch floods strip immediately; novel lines pass verbatim."""
    import os
    import time

    from pyspark.sql import types as T

    from laradb_spark.streaming.dedup import line_ingest_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "in")
    os.makedirs(src)
    banner = "subscribe to our newsletter"
    # batch 1: banner ×2 (≤ threshold 2 → kept), flood ×3 within batch
    spark.createDataFrame(
        [(1, f"{banner}\nbody one"), (2, f"{banner}\nbody two"),
         (3, "flood\nflood\nflood\nbody three")],
        doc_schema,
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 2: banner's cumulative count hits 3 (> 2) → stripped now
    spark.createDataFrame(
        [(10, f"{banner}\nbody ten"), (11, "completely novel text")], doc_schema
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("lidx", "lout", "lck"))
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = line_ingest_stream(stream, idx, out, ck, max_occurrences=2)
    q.awaitTermination(120)
    got = {r.doc_id: (r.clean_text, r.n_lines_removed)
           for r in spark.read.parquet(out).collect()}
    assert got == {
        1: (f"{banner}\nbody one", 0),   # cumulative 2 ≤ 2 in batch 1
        2: (f"{banner}\nbody two", 0),
        3: ("body three", 3),            # intra-batch flood
        10: ("body ten", 1),             # history(2) + batch(1) > 2
        11: ("completely novel text", 0),
    }
    # index holds per-batch count rows; cumulative banner count == 3
    from pyspark.sql import functions as F

    idx_df = spark.read.parquet(idx)
    ban = idx_df.filter(F.col("h") == F.md5(F.lit(banner))).agg(F.sum("n")).collect()[0][0]
    assert ban == 3

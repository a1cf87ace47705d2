"""BPE-merge application: expression path, Arrow twin, Python encoders.

The equivalence chain under test: DuckDB oracle (checker) == Spark
expression chain == in-rank-order Python sweep == rank-priority GPT-2
loop == Arrow twin. The sweep/priority equivalence only holds for merge
tables that came out of BPE TRAINING (a pair can only involve symbols
that existed before it) — so the property test trains real tables from
random corpora instead of sampling arbitrary pair lists.
"""

import collections

from pyspark.sql import functions as F

from laradb_spark.pipelines.tokenizer import (
    BPE_SEP,
    DEMO_BPE_MERGES,
    bpe_encode,
    bpe_encode_str,
    bpe_encode_str_sweep,
    bpe_ranks,
    bpe_token_count,
    bpe_token_count_arrow,
)


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE trainer (most-frequent adjacent pair, ties to the
    lexicographically smallest, no end-of-word marker) — the same
    procedure that produced DEMO_BPE_MERGES from sf0.01."""
    wordfreq = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    vocab = {tuple(w): c for w, c in wordfreq.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        mx = max(pairs.values())
        a, b = sorted(p for p, c in pairs.items() if c == mx)[0]
        merges.append((a, b))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_merge_application_hand_computed():
    # merges: (l,o) -> lo, (lo,w) -> low, (e,r) -> er
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    assert bpe_encode_str_sweep("lower", merges) == ["low", "er"]
    assert bpe_encode_str_sweep("lolo", merges) == ["lo", "lo"]
    # left-to-right non-overlapping: "lll" + (l,l) merges the FIRST pair
    assert bpe_encode_str_sweep("lll", [("l", "l")]) == ["ll", "l"]
    # rank order matters: (o,w) never fires because (l,o) consumed the o
    assert bpe_encode_str_sweep("low", [("l", "o"), ("o", "w")]) == ["lo", "w"]


def test_sweep_equals_rank_priority_on_trained_tables():
    corpora = [
        ["the cat sat on the mat", "the cat ran", "a tall cattle call"],
        ["aaa aab aba abb baa", "ababab bababa", "aa bb ab ba"],
        ["spark shuffle partition join", "join scan filter join"],
    ]
    for texts in corpora:
        merges = train_bpe(texts, 12)
        ranks = bpe_ranks(merges)
        words = {w for t in texts for w in t.split(" ") if w}
        words |= {"unseen", "zzz", "thecat", "ababa"}
        for w in words:
            assert bpe_encode_str_sweep(w, merges) == bpe_encode_str(w, ranks), (
                w,
                merges,
            )


def test_expression_path_matches_python_sweep(spark):
    rows = [
        (1, "lower low lowest"),
        (2, ""),  # no words: absent
        (3, "er er lolo"),
        (4, f"bad{BPE_SEP}sep word"),  # reserved char stripped on entry
        (5, "emoji 🎉x cat"),  # astral codepoint must not split
    ]
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("c", "a"), ("ca", "t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_count(df, merges).collect()
    }
    want = {}
    for did, txt in rows:
        words = [w for w in txt.split(" ") if w]
        if not words:
            continue
        want[did] = (
            len(words),
            sum(len(bpe_encode_str_sweep(w, merges)) for w in words),
        )
    assert got == want
    assert 2 not in got


def test_arrow_twin_bit_identical_to_expression(spark):
    texts = [
        "the customer batch scan filter join row",
        "small column hash join lower",
        "",
        "zzz unseen wordforms everywhere",
    ]
    merges = train_bpe(texts, 15)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expr = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_count(df, merges).collect()
    }
    arrow = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_count_arrow(df, merges).collect()
    }
    assert expr == arrow and len(expr) == 3


def test_bpe_encode_preserves_token_order(spark):
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    df = spark.createDataFrame([(1, "lower low er")], "doc_id long, text string")
    (row,) = bpe_encode(df, merges).collect()
    assert row.bpe_tokens == ["low", "er", "low", "er"]


def test_bpe_train_matches_python_trainer(spark):
    """The distributed trainer learns the exact merge sequence of the
    pure-Python classic trainer (same frequency counts, same
    lexicographic tie-break) on corpora with ties, repeats, and unicode;
    the learned table round-trips through apply."""
    from laradb_spark.pipelines.tokenizer import bpe_train

    corpora = [
        ["the cat sat on the mat", "the cat ran", "a tall cattle call"],
        ["aaa aab aba abb baa", "ababab bababa", "aa bb ab ba"],
        ["héllo wörld héllo", "naïve héllo"],
    ]
    for texts in corpora:
        want = train_bpe(texts, 10)
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = bpe_train(df, 10)
        assert got == want, (texts, got, want)
    # applying the in-engine-trained table == applying the python-trained
    texts = corpora[0]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = bpe_train(df, 8)
    a = sorted(map(tuple, bpe_token_count(df, merges).collect()))
    b = sorted(map(tuple, bpe_token_count(df, train_bpe(texts, 8)).collect()))
    assert a == b


def test_bpe_train_exhausts_and_empty(spark):
    """More merges requested than pairs exist -> stops clean; an empty /
    token-less corpus trains an empty table."""
    from laradb_spark.pipelines.tokenizer import bpe_train

    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = bpe_train(df, 50)
    assert got == train_bpe(["ab ab"], 50) == [("a", "b")]
    empty = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    assert bpe_train(empty, 3) == []


def test_merge_table_roundtrip(spark, tmp_path):
    """Stored merge artifact: save → load preserves rank order exactly
    (rank column is the authority, not file row order), and applying the
    loaded table reproduces the original counts."""
    from laradb_spark.pipelines.tokenizer import bpe_load_merges, bpe_save_merges

    merges = train_bpe(["the cat sat on the mat", "a cattle call"], 10)
    p = str(tmp_path / "merges")
    bpe_save_merges(spark, merges, p)
    assert bpe_load_merges(spark, p) == merges
    df = spark.createDataFrame([(1, "the cattle sat")], "doc_id long, text string")
    a = bpe_token_count(df, merges).collect()
    b = bpe_token_count(df, bpe_load_merges(spark, p)).collect()
    assert a == b


def test_bpe_tokens_per_source_counts_and_apportionment(spark):
    """Per-source totals replay the Python sweep; token-less docs count
    toward n_docs with 0 tokens; the Hamilton core over BPE counts sums
    exactly to the budget."""
    from laradb_spark.pipelines.curation import apportion_token_counts
    from laradb_spark.pipelines.tokenizer import bpe_tokens_per_source

    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    rows = [
        (1, "lower lower", "A"),
        (2, "", "A"),          # token-less: n_docs yes, 0 tokens
        (3, "er", "B"),
        (4, "xyz lower", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    per_src = bpe_tokens_per_source(df, merges)
    got = {r.source: (r.n_docs, r.n_tokens) for r in per_src.collect()}
    want = {}
    for _, txt, src in rows:
        nd, nt = want.get(src, (0, 0))
        want[src] = (
            nd + 1,
            nt
            + sum(
                len(bpe_encode_str_sweep(w, merges))
                for w in txt.split(" ")
                if w
            ),
        )
    assert got == want
    alloc = apportion_token_counts(per_src, budget=101).collect()
    assert sum(r.alloc_tokens for r in alloc) == 101


def test_bpe_fuzz_expression_matches_python(spark):
    """Seeded fuzz: one batch of adversarial words (unicode, astral,
    punctuation, the reserved US char, repeats) through a table trained
    on the same corpus — expression path, Arrow twin, and Python sweep
    must agree word for word."""
    import random

    rng = random.Random(0xBEEF)
    alphabet = "ab¢éxyz🎉._-\x1f"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    ]
    texts = [" ".join(words[i::6]) for i in range(6)]
    # the engine strips the reserved US char before char-splitting; the
    # pure-Python trainer must see the same stripped words
    merges = train_bpe([t.replace(BPE_SEP, "") for t in texts], 20)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    expr = {r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_token_count(df, merges).collect()}
    arrow = {r.doc_id: (r.n_words, r.n_bpe_tokens)
             for r in bpe_token_count_arrow(df, merges).collect()}
    want = {}
    for did, txt in enumerate(texts):
        ws = [w for w in txt.split(" ") if w]
        if not ws:
            continue
        want[did] = (
            len(ws),
            sum(len(bpe_encode_str_sweep(w, merges)) for w in ws),
        )
    assert expr == arrow == want


def test_demo_merges_compress_the_corpus(spark, sf_dir):
    """On real documents the learned table must strictly compress
    vs characters and stay >= word count (merging never crosses words)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bpe_token_count(df, DEMO_BPE_MERGES)
    agg = out.agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    chars = df.select(
        F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("c")
    ).collect()[0].c
    assert agg.w <= agg.t < chars

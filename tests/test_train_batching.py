"""Batched merge-training equivalence: the batched trainers must emit the
IDENTICAL merge table to the merge-at-a-time loop (VERDICT r11 #2).

Two layers of evidence:

- Hypothesis property tests drive the REAL selection functions
  (`_select_merge_batch`, `_select_wordpiece_batch`) through pure-Python
  twins of both trainer loops against the sequential oracles over random
  corpora — thousands of adversarial tie/overlap configurations per run,
  no Spark in the loop.
- Spark pins re-train the existing tie-heavy/unicode corpora at several
  batch widths and require bit-identical tables (the engine loop and the
  Python twin share the selection functions AND the rewrite semantics,
  so the property layer transfers).
"""

import collections

import pytest

from laradb_spark.pipelines.tokenizer import (
    _bpe_train_inmemory,
    _merge_once_to,
    _select_merge_batch,
    _select_wordpiece_batch,
    _wordpiece_train_inmemory,
)

WP_SCALE = 10**12


# ---------------------------------------------------------------- twins


def _bpe_vocab(texts):
    wf = collections.Counter(w for t in texts for w in t.split(" ") if w)
    return {tuple(w): c for w, c in wf.items()}


def _pair_counts(vocab):
    pairs = collections.Counter()
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    return pairs


def _apply_steps(vocab, steps):
    new = {}
    for syms, c in vocab.items():
        s = list(syms)
        for a, b, m in steps:
            if len(s) < 2:
                break
            s = _merge_once_to(s, a, b, m)
        new[tuple(s)] = new.get(tuple(s), 0) + c
    return new


def train_bpe_seq(texts, n_merges):
    """Sequential oracle — same procedure as tests/test_tokenizer.train_bpe."""
    vocab = _bpe_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        vocab = _apply_steps(vocab, [(a, b, a + b)])
    return merges


def train_bpe_batched(texts, n_merges, batch):
    """Python twin of the batched `_bpe_train_loop`: same candidate order,
    same limit(batch+1) head, same selector, same rewrite semantics."""
    vocab = _bpe_vocab(texts)
    merges = []
    while len(merges) < n_merges:
        k = min(batch, n_merges - len(merges))
        pairs = _pair_counts(vocab)
        rows = [
            (a, b, n)
            for (a, b), n in sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        ][: k + 1]
        sel = _select_merge_batch(rows, k)
        if not sel:
            break
        merges.extend(sel)
        vocab = _apply_steps(vocab, [(a, b, a + b) for a, b in sel])
    return merges


def _wp_vocab(texts):
    wf = collections.Counter(w for t in texts for w in t.split(" ") if w)
    return {
        tuple([w[0]] + ["##" + ch for ch in w[1:]]): c for w, c in wf.items()
    }


def _wp_scored_rows(vocab):
    pairs = _pair_counts(vocab)
    units = collections.Counter()
    for syms, c in vocab.items():
        for s in syms:
            units[s] += c
    rows = []
    for (a, b), n in pairs.items():
        ca, cb = units[a], units[b]
        rows.append((a, b, n, ca, cb, (n * WP_SCALE) // (ca * cb)))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows


def _wp_merged(a, b):
    return a + (b[2:] if b.startswith("##") else b)


def train_wp_seq(texts, n_merges):
    vocab = _wp_vocab(texts)
    merges = []
    for _ in range(n_merges):
        rows = _wp_scored_rows(vocab)
        if not rows:
            break
        a, b = rows[0][0], rows[0][1]
        m = _wp_merged(a, b)
        merges.append(m)
        vocab = _apply_steps(vocab, [(a, b, m)])
    return merges


def train_wp_batched(texts, n_merges, batch):
    vocab = _wp_vocab(texts)
    merges = []
    while len(merges) < n_merges:
        k = min(batch, n_merges - len(merges))
        rows = _wp_scored_rows(vocab)[: k + 1]
        sel = _select_wordpiece_batch(rows, k)
        if not sel:
            break
        steps = [(a, b, _wp_merged(a, b)) for a, b in sel]
        merges.extend(m for _a, _b, m in steps)
        vocab = _apply_steps(vocab, steps)
    return merges


# ------------------------------------------------------- property layer


def test_select_merge_batch_invariants_property():
    """The selector's safety rules, fuzzed over random candidate lists:
    the batch is a rank-contiguous prefix (or the argmax fallback),
    pairwise symbol-disjoint, free of symbol==earlier-concat collisions,
    and every member's count strictly exceeds the first excluded row's
    (except in the single-argmax fallback)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.text(alphabet="abc#", min_size=1, max_size=2)
    row = st.tuples(sym, sym, st.integers(min_value=1, max_value=9))

    @settings(max_examples=400, deadline=None)
    @given(st.lists(row, min_size=0, max_size=12), st.integers(1, 6))
    def check(rows, batch):
        rows = sorted(set(rows), key=lambda r: (-r[2], r[0], r[1]))
        rows = rows[: batch + 1]
        sel = _select_merge_batch(rows, batch)
        assert len(sel) <= batch or len(sel) == 1
        if not rows:
            assert sel == []
            return
        assert sel, "non-empty candidates must select at least the argmax"
        ordered = [(a, b) for a, b, _n in rows]
        assert sel == ordered[: len(sel)], "must be a rank-contiguous prefix"
        if len(sel) > 1:
            used, concats = set(), set()
            for j, (a, b) in enumerate(sel):
                assert a not in used and b not in used
                assert a not in concats and b not in concats
                if a == b:  # a self-pair closes the batch
                    assert j == len(sel) - 1
                used.update((a, b))
                concats.add(a + b)
            cut = rows[len(sel)][2] if len(sel) < len(rows) else 0
            for i, (_a, _b) in enumerate(sel):
                assert rows[i][2] > cut

    check()


def test_bpe_batched_equals_sequential_property():
    """Random corpora over a tiny alphabet (maximal tie/overlap density —
    the regime where naive batching diverges) train the identical merge
    table at every batch width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="aabc", min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(corpus, st.integers(1, 12), st.integers(2, 8))
    def check(words, n_merges, batch):
        texts = [" ".join(words)]
        want = train_bpe_seq(texts, n_merges)
        assert train_bpe_batched(texts, n_merges, batch) == want
        assert (
            _bpe_train_inmemory(list(_bpe_vocab(texts).items()), n_merges)
            == want
        )

    check()


def test_wordpiece_batched_equals_sequential_property():
    """Same adversarial regime for the likelihood-scored selector, whose
    extra hazard is score INFLATION of overlapping pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="aabc", min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=10)

    @settings(max_examples=300, deadline=None)
    @given(corpus, st.integers(1, 10), st.integers(2, 8))
    def check(words, n_merges, batch):
        texts = [" ".join(words)]
        want = train_wp_seq(texts, n_merges)
        assert train_wp_batched(texts, n_merges, batch) == want
        assert (
            _wordpiece_train_inmemory(list(_wp_vocab(texts).items()), n_merges)
            == want
        )

    check()


def test_known_divergence_case_is_guarded():
    """The construction that breaks disjointness-only batching: merging
    (a,c) in "acz" creates ("ac","z"), which lex-precedes the disjoint
    ("b","d") at equal count — sequential picks the NEW pair. The strict
    count-above-cut trim must collapse the batch to the argmax."""
    texts = ["acz bd"]
    assert train_bpe_seq(texts, 2) == [("a", "c"), ("ac", "z")]
    for batch in (2, 3, 8):
        assert train_bpe_batched(texts, 2, batch) == [("a", "c"), ("ac", "z")]


# ----------------------------------------------------------- spark pins


@pytest.mark.slow  # driver-verify gate (r16): long-tail; run with -m ""
def test_spark_bpe_train_batched_pin(spark):
    """The engine loop emits the identical table at every batch width on
    the tie-heavy / repeat / unicode corpora (batch=1 IS the legacy
    merge-at-a-time path — expression-fold rewrite and all)."""
    from laradb_spark.pipelines.tokenizer import bpe_train

    corpora = [
        ["the cat sat on the mat", "the cat ran", "a tall cattle call"],
        ["aaa aab aba abb baa", "ababab bababa", "aa bb ab ba"],
        ["héllo wörld héllo", "naïve héllo"],
    ]
    for texts in corpora:
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        want = bpe_train(df, 10, batch=1, driver_vocab_max=0)
        assert want == train_bpe_seq(texts, 10)
        for batch in (3, 64):
            assert bpe_train(df, 10, batch=batch, driver_vocab_max=0) == want, (
                texts,
                batch,
            )
        assert bpe_train(df, 10) == want  # in-memory default route


@pytest.mark.slow  # driver-verify gate (r16): long-tail; run with -m ""
def test_spark_wordpiece_train_batched_pin(spark):
    from laradb_spark.pipelines.tokenizer import wordpiece_train

    corpora = [
        ["hugs hug hugged pug pugs", "un unhug huggable"],
        ["aaa aab aba abb baa", "ababab bababa"],
    ]
    for texts in corpora:
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        want = wordpiece_train(df, 8, batch=1, driver_vocab_max=0)
        for batch in (3, 64):
            assert (
                wordpiece_train(df, 8, batch=batch, driver_vocab_max=0) == want
            ), (texts, batch)
        assert wordpiece_train(df, 8) == want  # in-memory default route


def test_spark_bpe_train_bytes_batched_pin(spark):
    from laradb_spark.pipelines.tokenizer import bpe_train_bytes

    texts = ["héllo wörld, don't!", "the cat's mat   spaces", "aaa ab ab aaa"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    want = bpe_train_bytes(df, 12, batch=1, driver_vocab_max=0)
    for batch in (4, 64):
        assert bpe_train_bytes(df, 12, batch=batch, driver_vocab_max=0) == want
    assert bpe_train_bytes(df, 12) == want  # in-memory default route


def test_batch_validation():
    from laradb_spark.pipelines.tokenizer import _bpe_train_loop

    with pytest.raises(ValueError, match="batch"):
        _bpe_train_loop(None, 3, batch=-1)


def test_bpe_train_bytes_4k_vocab_demo(spark):
    """Production-scale vocab demo (VERDICT r11 #2 'Done' criterion): a
    4096-merge byte-level BPE vocabulary trains in seconds via the
    in-memory route — one distributed word-count aggregate, then the
    exact incremental merge loop (vs one Spark job per merge, which at
    ~1.3s/round would need ~90 minutes). Corpus: deterministic ~9k-word
    Zipf synthetic (the sf fixtures' documents table has a ~40-word
    vocabulary — too poor to support 4k merges)."""
    import time

    from laradb_spark.pipelines.tokenizer import (
        bpe_train_bytes,
        bpe_validate_merges,
    )

    docs = _zipf_docs(spark)
    t0 = time.time()
    merges = bpe_train_bytes(docs, 4096)
    wall = time.time() - t0
    assert len(merges) == 4096
    bpe_validate_merges(merges)  # trained-shape invariants hold
    assert wall < 120, f"4k-merge training took {wall:.0f}s"


def _zipf_docs(spark, n_words=9000):
    """Deterministic ~n_words-distinct Zipf word corpus (the 4k-demo
    builder, shared): the sf fixtures' ~40-word vocabulary can't exercise
    vocabulary sampling."""
    from pyspark.sql import functions as F

    words = spark.range(n_words).select(
        F.col("id"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(3) + (F.col("id") % 4).cast("int")),
                lambda j: F.chr(
                    F.lit(97) + F.pmod(F.xxhash64(F.col("id") * 31 + j), F.lit(26))
                ),
            ),
        ).alias("w"),
        F.greatest(
            F.lit(1), (F.lit(3000) / F.pow(F.col("id") + 1, F.lit(0.8))).cast("int")
        ).alias("cnt"),
    )
    return (
        words.select(
            (F.col("id") % 64).alias("doc_id"),
            F.concat_ws(
                " ", F.flatten(F.array_repeat(F.array("w"), F.col("cnt").cast("int")))
            ).alias("chunk"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("chunk")).alias("text"))
    )


def test_bpe_train_sampled_drift_certificate(spark):
    """VERDICT r12 #4 'Done' criterion (sampling-recipe branch): the
    sample-then-train production route for >driver-ceiling vocabularies —
    train on the top-K distinct words by mass, certify occurrence-weighted
    fertility drift against the FULL corpus with a pinned bound.

    Pins (this corpus is the WORST case for sampling — its tail words are
    random letter strings sharing no subword structure with the head, so
    real-corpus drift sits well under these bounds): (1) a 2/3-vocabulary
    sample covers >90% of occurrence mass and drifts <=3% fertility (the
    pinned ε; measured 2.6%); (2) drift shrinks monotonically as the cap
    grows — the certificate is an actionable knob, not a constant; (3)
    with the cap >= the true distinct count the recipe is EXACT —
    bit-identical merges to bpe_train and zero drift; (4) an
    unrepresentative sample breaches max_drift_ppm and fails loudly with
    the certificate attached."""
    import pytest as _pytest

    from laradb_spark.pipelines.tokenizer import bpe_train, bpe_train_sampled

    docs = _zipf_docs(spark)
    merges, cert = bpe_train_sampled(docs, 400, sample_vocab=6000)
    assert len(merges) == 400
    assert cert["n_words_sampled"] == 6000 < cert["n_words_full"]
    assert cert["mass_covered_ppm"] > 900_000
    assert cert["drift_ppm"] <= 30_000, cert
    _, cert_small = bpe_train_sampled(docs, 400, sample_vocab=1500)
    assert cert_small["drift_ppm"] > cert["drift_ppm"], (cert_small, cert)
    # exactness pin: cap >= vocab -> the sample IS the vocabulary
    full = bpe_train(docs, 400)
    m2, c2 = bpe_train_sampled(docs, 400, sample_vocab=10**6)
    assert m2 == full
    assert c2["drift_ppm"] == 0 and c2["mass_covered_ppm"] == 1_000_000
    # gate: a 20-word sample cannot certify 50 merges at zero drift
    with _pytest.raises(ValueError, match="drift"):
        bpe_train_sampled(docs, 50, sample_vocab=20, max_drift_ppm=0)


def test_bpe_train_bytes_sampled_matches_word_level_contract(spark):
    """The byte-level sampled trainer (pretoken vocabulary, byte-mapped
    symbols) honors the same contract: exactness at cap >= vocab
    (bit-identical to bpe_train_bytes, zero drift), monotone drift in the
    cap, and the max_drift_ppm gate."""
    import pytest as _pytest

    from laradb_spark.pipelines.tokenizer import (
        bpe_train_bytes,
        bpe_train_bytes_sampled,
    )

    docs = _zipf_docs(spark)
    full = bpe_train_bytes(docs, 300)
    m_exact, c_exact = bpe_train_bytes_sampled(docs, 300, sample_vocab=10**6)
    assert m_exact == full
    assert c_exact["drift_ppm"] == 0 and c_exact["mass_covered_ppm"] == 1_000_000
    m_cap, c_cap = bpe_train_bytes_sampled(docs, 300, sample_vocab=6000)
    assert len(m_cap) == 300
    assert c_cap["drift_ppm"] <= 30_000, c_cap
    with _pytest.raises(ValueError, match="drift"):
        bpe_train_bytes_sampled(docs, 50, sample_vocab=20, max_drift_ppm=0)


def test_wordpiece_train_sampled_contract(spark):
    """WordPiece sampled trainer: base pieces from the FULL corpus
    (alphabet-sized — removes the naive sample's [UNK] cliff, proven by
    unk_full_ppm == 0 here since no word exceeds WORDPIECE_MAX_CHARS),
    merges from the top-K sample; exactness at cap >= vocab (bit-identical
    to wordpiece_train, zero drift); pinned drift bound at a 2/3 cap; the
    max_drift_ppm gate fails loudly."""
    import pytest as _pytest

    from laradb_spark.pipelines.tokenizer import (
        wordpiece_train,
        wordpiece_train_sampled,
    )

    docs = _zipf_docs(spark)
    full = wordpiece_train(docs, 300)
    v_exact, c_exact = wordpiece_train_sampled(docs, 300, sample_vocab=10**6)
    assert v_exact == full
    assert c_exact["drift_ppm"] == 0 and c_exact["mass_covered_ppm"] == 1_000_000
    v_cap, c_cap = wordpiece_train_sampled(docs, 300, sample_vocab=6000)
    assert c_cap["drift_ppm"] <= 20_000, c_cap  # measured 13,348
    assert c_cap["unk_full_ppm"] == 0 == c_cap["unk_sample_ppm"]
    # full-corpus base pieces survive any cap (the no-[UNK]-cliff design)
    base_pieces = {p for p in v_exact if len(p) == 1 or (p.startswith("##") and len(p) == 3)}
    assert base_pieces <= set(v_cap)
    with _pytest.raises(ValueError, match="drift"):
        wordpiece_train_sampled(docs, 50, sample_vocab=20, max_drift_ppm=0)


def test_unigram_train_sampled_contract(spark):
    """VERDICT r13 #3 — the Unigram trainer gets the production-scale
    treatment the other two families have: (1) exactness at cap >= vocab
    (bit-identical scored vocabulary to unigram_train, zero drift);
    (2) pinned fertility-drift bound at a 2/3-vocabulary cap on the
    worst-case Zipf corpus; (3) full-corpus single-char injection keeps
    the UNK-free floor across the sample boundary (unk_full_ppm == 0 even
    for tail words the sample never saw); (4) the max_drift_ppm gate
    fails loudly with the certificate; (5) the unsampled trainer's
    driver_piece_max ceiling refuses past-budget seed tables and directs
    to the sampled route."""
    import pytest as _pytest

    from laradb_spark.pipelines.tokenizer import (
        unigram_train,
        unigram_train_sampled,
    )

    docs = _zipf_docs(spark)
    full = unigram_train(docs, 300)
    v_exact, c_exact = unigram_train_sampled(docs, 300, sample_vocab=10**6)
    assert v_exact == full
    assert c_exact["drift_ppm"] == 0 and c_exact["mass_covered_ppm"] == 1_000_000
    assert c_exact["unk_full_ppm"] == 0 == c_exact["unk_sample_ppm"]
    v_cap, c_cap = unigram_train_sampled(docs, 300, sample_vocab=6000)
    assert c_cap["n_words_sampled"] == 6000 < c_cap["n_words_full"]
    assert c_cap["mass_covered_ppm"] > 900_000
    assert c_cap["drift_ppm"] <= 30_000, c_cap
    # the UNK-free floor holds across the sample boundary
    assert c_cap["unk_full_ppm"] == 0 == c_cap["unk_sample_ppm"]
    with _pytest.raises(ValueError, match="drift"):
        unigram_train_sampled(docs, 50, sample_vocab=20, max_drift_ppm=0)
    with _pytest.raises(ValueError, match="unigram_train_sampled"):
        unigram_train(docs, 300, driver_piece_max=100)


@pytest.mark.slow  # driver-verify gate (r16): long-tail; run with -m ""
def test_wordpiece_train_2k_vocab_demo(spark):
    """The second trainer family at production scale: a 2048-merge
    WordPiece vocabulary through the in-memory likelihood loop (the
    re-rank-on-unit-change heap) in seconds. Also pins the all-routes
    contract at depth on a richer corpus: the first 40 merges of the
    distributed batched loop equal the in-memory table's prefix."""
    import time

    from pyspark.sql import functions as F

    from laradb_spark.pipelines.tokenizer import wordpiece_train

    n_words = 4000
    words = spark.range(n_words).select(
        F.col("id"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(3) + (F.col("id") % 4).cast("int")),
                lambda j: F.chr(
                    F.lit(97) + F.pmod(F.xxhash64(F.col("id") * 17 + j), F.lit(26))
                ),
            ),
        ).alias("w"),
        F.greatest(
            F.lit(1), (F.lit(1500) / F.pow(F.col("id") + 1, F.lit(0.8))).cast("int")
        ).alias("cnt"),
    )
    docs = (
        words.select(
            (F.col("id") % 32).alias("doc_id"),
            F.concat_ws(
                " ", F.flatten(F.array_repeat(F.array("w"), F.col("cnt").cast("int")))
            ).alias("text"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
    )
    t0 = time.time()
    vocab = wordpiece_train(docs, 2048)
    wall = time.time() - t0
    merged_pieces = [p for p in vocab if len(p.lstrip("#")) > 1]
    assert len(merged_pieces) >= 2048
    assert wall < 120, f"2k-merge WordPiece training took {wall:.0f}s"
    # depth pin: distributed batched loop tracks the in-memory table
    got = wordpiece_train(docs, 40, batch=8, driver_vocab_max=0)
    assert got == wordpiece_train(docs, 40)

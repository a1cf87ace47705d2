"""Golden tests ported from the reference's standalone examples.

WordCount (reference: examples/wordcount/WordCountQuery.kt:12-65,
WordCount_Lara_Standalone_Example.kt:22-33) and RainySunny
(reference: examples/rainysunny/RainySunnyQuery.kt:9-36).
"""

from pyspark.sql import functions as F

from laradb_spark import Attribute, ExtFun, LaraSchema, LaraTable, MapFun, ValAttribute

WORDCOUNT_DOCS = [
    ("doc1", "she sells sea shells by the sea shore"),
    ("doc2", "the shells she sells are surely seashells"),
    ("doc3", "so if she sells shells on the seashore"),
    ("doc4", "i'm sure she sells seashore shells"),
]

# Expected per reference WordCountQuery.kt:48-65.
WORDCOUNT_EXPECTED = {
    "she": 4, "sells": 4, "shells": 4, "the": 3, "sea": 2, "seashore": 2,
    "are": 1, "by": 1, "i'm": 1, "if": 1, "on": 1, "seashells": 1,
    "shore": 1, "so": 1, "sure": 1, "surely": 1,
}


def test_wordcount_lara_pipeline(spark):
    docs_schema = LaraSchema.of([("docid", "STRING")], [("text", "STRING", "")])
    docs = LaraTable.from_rows(spark, WORDCOUNT_DOCS, docs_schema)

    # ExtFun: tokenize (reference: WordCountQuery.kt:33-37) — fast path:
    # explode(split) with a per-doc pre-count folded in by the later agg.
    tokenize = ExtFun(
        "tokenize",
        LaraSchema.of([("word", "STRING")], [("cnt", "INT", 0)]),
        expr=lambda text: F.transform(
            F.filter(F.split(text, r"\s+"), lambda w: w != F.lit("")),
            lambda w: F.struct(w.alias("word"), F.lit(1).alias("cnt")),
        ),
        expr_cols=("text",),
    )
    # Load → Ext → Sort(word) → Agg(word, sum) (reference: WordCountQuery.kt:41-44)
    result = (
        docs.ext(tokenize)
        .sort(["word", "docid"])
        .agg(["word"], {"cnt": "sum_long"})
    )
    got = {r[0]: r[1] for r in result.collect_sorted()}
    assert got == WORDCOUNT_EXPECTED


def test_wordcount_python_ext_path(spark):
    """Same query through the general (mapInPandas) ExtFun path."""
    docs_schema = LaraSchema.of([("docid", "STRING")], [("text", "STRING", "")])
    docs = LaraTable.from_rows(spark, WORDCOUNT_DOCS, docs_schema)
    tokenize = ExtFun(
        "tokenize_py",
        LaraSchema.of([("word", "STRING")], [("cnt", "INT", 0)]),
        py_fn=lambda rec: [{"word": w, "cnt": 1} for w in rec["text"].split() if w],
    )
    result = docs.ext(tokenize).agg(["word"], {"cnt": "sum_long"})
    got = {r[0]: r[1] for r in result.collect_sorted()}
    assert got == WORDCOUNT_EXPECTED


RAINY = [
    ("msg1", "Hello World!"),
    ("msg2", "Hello Glorious World!"),
    ("msg3", "Hello Rainy World!"),
]


def test_rainysunny_map(spark):
    schema = LaraSchema.of([("k", "STRING")], [("v", "STRING", "")])
    msgs = LaraTable.from_rows(spark, RAINY, schema)
    # MapFun: replace Rainy→Sunny (reference: RainySunnyQuery.kt:27-33;
    # iterator form examples/rainysunny/MapRainToSunIterator.kt).
    rain_to_sun = MapFun(
        "rainToSun",
        (ValAttribute("v", "STRING", ""),),
        {"v": lambda df: F.regexp_replace(df["v"], "Rainy", "Sunny")},
    )
    got = msgs.map(rain_to_sun).collect_sorted()
    assert got == [
        ("msg1", "Hello World!"),
        ("msg2", "Hello Glorious World!"),
        ("msg3", "Hello Sunny World!"),
    ]

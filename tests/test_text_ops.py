"""Text-operator unit tests (markup stripping).

The rest of the text-analysis surface is parity-tested via its registry
oracles (tests/test_oracle_parity.py) and the hygiene/pipeline suites.
"""

from __future__ import annotations


def test_strip_markup_extracts_prose(spark):
    """Script/style bodies vanish, tags go, entities decode, block closers
    become newlines; plain prose is untouched (modulo whitespace); and the
    pass is idempotent (a second strip changes nothing)."""
    from squrve_spark.operators.text import strip_markup

    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- nav --><h1>Title &amp; More</h1>"
        "<p>First &lt;para&gt;.</p><p>Second&nbsp;para.</p>"
        "<ul><li>a</li><li>b</li></ul></body></html>"
    )
    df = spark.createDataFrame(
        [(0, html), (1, "plain  text stays"), (2, "a < b and c > d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in strip_markup(df).collect()}
    assert out[0] == "Title & More\nFirst <para>.\nSecond para.\na\nb"
    assert out[1] == "plain text stays"
    assert out[2] == "a < b and c > d"  # bare comparisons are not tags

    # idempotent on markup-free text (docs 0/2 legitimately are NOT: the
    # pass decodes &lt;para&gt; to a literal <para>, which a second pass
    # reads as a tag — single-pass semantics, like every HTML extractor)
    twice = {r["doc_id"]: r["text"] for r in strip_markup(strip_markup(df)).collect()}
    assert twice[1] == out[1]


def test_strip_markup_preserves_escaped_entity_literals(spark):
    """Regression (review r4): '&amp;lt;b&amp;gt;' is the AUTHOR'S literal
    text '&lt;b&gt;' — decoding &amp; last must not double-decode it into
    a phantom '<b>' tag."""
    from squrve_spark.operators.text import strip_markup

    df = spark.createDataFrame(
        [(0, "<p>escape demo: &amp;lt;b&amp;gt; stays text</p>")],
        "doc_id long, text string",
    )
    out = strip_markup(df).first()["text"]
    assert out == "escape demo: &lt;b&gt; stays text"


def test_segment_dedup_removes_corpus_frequent_lines(spark):
    """C4-style line dedup: the boilerplate line shared by 3 docs goes,
    unique lines stay, order is preserved, counts are exact, and a doc
    made ENTIRELY of boilerplate comes back as an empty string."""
    from squrve_spark.operators.text import segment_dedup

    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (0, f"unique opening\n{boiler}\nunique closing"),
            (1, f"{boiler}\nmiddle text here"),
            (2, boiler),
            (3, "no boilerplate at all"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in segment_dedup(df, min_df=3).collect()
    }
    assert out[0]["cleaned"] == "unique opening\nunique closing"
    assert (out[0]["n_segments"], out[0]["n_removed"]) == (3, 1)
    assert out[1]["cleaned"] == "middle text here"
    assert out[2]["cleaned"] == "" and out[2]["n_removed"] == 1
    assert out[3]["cleaned"] == "no boilerplate at all"
    assert out[3]["n_removed"] == 0
    assert out[4]["cleaned"] == "" and out[4]["n_segments"] == 1


def test_segment_dedup_threshold_and_whitespace_keys(spark):
    """min_df binds on DISTINCT docs (a line repeated within ONE doc is
    not boilerplate at min_df=2 across docs... unless two docs share it);
    blank segments are never dropped (they key as '')."""
    from squrve_spark.operators.text import segment_dedup

    df = spark.createDataFrame(
        [
            (0, "same\nsame\nonly here"),  # repeats within one doc only
            (1, "shared line\n\nafter blank"),
            (2, "shared line\ntail"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(df, min_df=2).collect()}
    assert out[0]["cleaned"] == "same\nsame\nonly here"  # df(doc)==1
    assert out[1]["cleaned"] == "\nafter blank"  # blank segment kept
    assert out[2]["cleaned"] == "tail"


def test_within_doc_dedup_keeps_first_occurrences(spark):
    """within_doc_dedup (r8): repeated tokens drop, first occurrences keep
    their order, unique docs pass through untouched."""
    from squrve_spark.operators.text import within_doc_dedup

    df = spark.createDataFrame(
        [(1, "a b a c b a"), (2, "x y z"), (3, "w w w w")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in within_doc_dedup(df).collect()}
    assert rows[1]["cleaned"] == "a b c"
    assert (rows[1]["n_tokens"], rows[1]["n_unique"]) == (6, 3)
    assert rows[2]["cleaned"] == "x y z" and rows[2]["n_unique"] == 3
    assert rows[3]["cleaned"] == "w" and rows[3]["n_tokens"] == 4

"""TextRank keywords (operators/keywords.textrank_keywords)."""

from medical_and_charity_document_extraction_system_spark.operators.keywords import (
    textrank_keywords,
)

UNIT, DN, DD = 1_000_000, 85, 100


def _ref_ranks(text: str, iterations: int = 4):
    """Independent integer fixed-point TextRank over one document."""
    toks = text.split()
    edges = set()
    for a, b in zip(toks, toks[1:]):
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    nodes = {n for e in edges for n in e}
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    base = UNIT - (DN * UNIT) // DD
    units = {n: UNIT for n in nodes}
    for _ in range(iterations):
        inflow = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + units[s] // od[s]
        units = {n: base + (DN * inflow.get(n, 0)) // DD for n in nodes}
    return units


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_matches_integer_reference(spark):
    texts = [
        "hub a hub b hub c hub d",
        "one two three two one two",
        "x y",
    ]
    out = textrank_keywords(_df(spark, texts), top_k=100)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, {})[r.word] = r.rank_units
    for i, t in enumerate(texts):
        assert got[i] == _ref_ranks(t), f"doc {i}"


def test_hub_word_ranks_first(spark):
    out = textrank_keywords(_df(spark, ["hub a hub b hub c hub d"]), top_k=1)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].word == "hub"


def test_single_word_doc_emits_nothing(spark):
    out = textrank_keywords(_df(spark, ["lonely", "a b"]), top_k=3)
    assert {r.doc_id for r in out.collect()} == {1}


def test_self_adjacency_dropped(spark):
    # "a a" has only a self-pair -> no edges -> no rows
    out = textrank_keywords(_df(spark, ["a a"]), top_k=3)
    assert out.count() == 0


def test_tie_broken_by_word_asc(spark):
    # symmetric 2-node graph: both words get identical units;
    # top_k=1 keeps the lexicographically smaller
    rows = textrank_keywords(_df(spark, ["beta alpha"]), top_k=1).collect()
    assert [r.word for r in rows] == ["alpha"]

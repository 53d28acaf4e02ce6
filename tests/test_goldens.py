"""Committed-golden test — the exact analog of the reference's
storage/json_tasks/*.json fixtures (byte-stable outputs committed to
the repo and compared on every run; SURVEY.md §5).

Unlike test_pipeline_e2e (which checks the pipeline against
construction-time expected records computed by the same codebase),
this golden file was generated once and committed: any behavior drift
in the synthesizer OR the pipeline — even a drift that changes both
consistently — fails here.
"""

import json
import os

import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "extractions_sf0001_first40.json"
)


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_pipeline_reproduces_committed_goldens(extracted_small, golden):
    got = {r.url: r for r in extracted_small.collect()}
    assert len(golden) == 40
    for g in golden:
        r = got[g["url"]]
        assert r.text == g["text"], g["url"]
        assert r.processing_method == g["processing_method"]
        assert r.page_count == g["page_count"]
        assert r.total_characters == g["total_characters"]
        assert r.total_words == g["total_words"]
        assert r.average_confidence == g["average_confidence"]
        assert r.engine == g["engine"]
        assert (r.error or None) == (g["error"] or None)
        got_spans = [
            {"field": s.field, "value": s.value, "start": s.start,
             "end": s.end, "confidence": s.confidence}
            for s in r.spans
        ]
        exp_spans = [
            {k: s[k] for k in ("field", "value", "start", "end", "confidence")}
            for s in g["spans"]
        ]
        assert got_spans == exp_spans, g["url"]
        got_pages = [
            {"page_number": p.page_number, "text": p.text,
             "char_count": p.char_count, "word_count": p.word_count,
             "confidence": p.confidence}
            for p in r.pages
        ]
        exp_pages = [
            {k: p[k] for k in ("page_number", "text", "char_count",
                               "word_count", "confidence")}
            for p in g["pages"]
        ]
        assert got_pages == exp_pages, g["url"]

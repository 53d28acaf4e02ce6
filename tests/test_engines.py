"""OCR engine registry: stub determinism, language mapping, and the
real-easyocr adapter wiring (skipped unless easyocr is installed)."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.engines import (
    EasyOCRAdapter,
    StubOCREngine,
    _UnavailableEngine,
    create_engine,
    get_engine,
    map_language,
)


def test_stub_engine_word_records_deterministic():
    eng = StubOCREngine()
    a = eng.process_page("scan 42")
    b = eng.process_page("scan 42")
    assert a == b
    assert [w["text"] for w in a["words"]] == ["scan", "42"]
    assert a["confidence"] == 80 + len("scan 42") % 20


def test_language_mapping_multi():
    assert map_language("eng+deu") == "en+de"
    assert map_language("eng+eng") == "en"
    assert map_language(None) == "en"
    assert map_language("zz") == "zz"  # passthrough


def test_tesseract_blocked():
    with pytest.raises(ValueError, match="tesseract"):
        create_engine("tesseract")


def test_easyocr_registry_degrades_without_package():
    """Without the package the registry returns the unavailable
    placeholder (raises on use); with it, the real adapter."""
    try:
        import easyocr  # noqa: F401

        has = True
    except ImportError:
        has = False
    eng = create_engine("easyocr")
    if has:
        assert isinstance(eng, EasyOCRAdapter)
    else:
        assert isinstance(eng, _UnavailableEngine)
        with pytest.raises(NotImplementedError):
            eng.process_page("x")


def test_easyocr_adapter_reads_netpbm_image():
    """Real-model path: only runs where easyocr (and its torch stack)
    is installed — the wiring contract the registry must satisfy."""
    pytest.importorskip("easyocr")
    import numpy as np

    from medical_and_charity_document_extraction_system_spark.functions import netpbm

    eng = get_engine("easyocr", "eng")
    assert isinstance(eng, EasyOCRAdapter)
    img = np.full((60, 200), 255, np.uint8)
    img[20:40, 10:190] = 0  # a black bar; content irrelevant, shape is
    out = eng.process_page(netpbm.encode(img))
    assert set(out) >= {"text", "confidence", "engine", "words"}
    assert out["engine"] == "easyocr"
    for w in out["words"]:
        assert out["text"][w["start"]:w["end"]] == w["text"]


def test_paddle_registry_degrades_without_package():
    try:
        import paddleocr  # noqa: F401

        pytest.skip("paddleocr installed; covered by the adapter test")
    except ImportError:
        pass
    from medical_and_charity_document_extraction_system_spark.operators.engines import create_engine

    eng = create_engine("paddle")
    with pytest.raises(NotImplementedError, match="paddleocr"):
        eng.process_page("x")


def test_paddle_adapter_word_records_via_fake_module(monkeypatch):
    """Adapter mapping logic (language table, first-of-'+', gray->3ch,
    line records -> word records with running offsets) exercised
    against a deterministic fake paddleocr module — the real model is
    not installable here, but every line of OUR code runs."""
    import sys
    import types

    import numpy as np

    captured = {}

    class FakePaddleOCR:
        def __init__(self, lang=None, **kw):
            captured["lang"] = lang

        def ocr(self, img, cls=True):
            captured["shape"] = np.asarray(img).shape
            return [[
                ([[0, 0], [10, 0], [10, 5], [0, 5]], ("Total: $12", 0.91)),
                ([[0, 10], [20, 10], [20, 15], [0, 15]], ("due 2024", 0.85)),
            ]]

    fake = types.ModuleType("paddleocr")
    fake.PaddleOCR = FakePaddleOCR
    monkeypatch.setitem(sys.modules, "paddleocr", fake)

    from medical_and_charity_document_extraction_system_spark.functions import netpbm
    from medical_and_charity_document_extraction_system_spark.operators.engines import (
        PaddleOCRAdapter, create_engine,
    )

    eng = create_engine("paddle", language="de+fr")
    assert isinstance(eng, PaddleOCRAdapter)
    assert captured["lang"] == "german"  # first part of '+', paddle table

    img = np.full((6, 8), 200, np.uint8)
    out = eng.process_page(netpbm.encode(img))
    assert captured["shape"] == (6, 8, 3)  # gray stacked to 3 channels
    assert out["text"] == "Total: $12 due 2024"
    assert out["engine"] == "paddleocr"
    assert [w["word_num"] for w in out["words"]] == [1, 2]
    assert out["words"][0]["start"] == 0 and out["words"][0]["end"] == 10
    assert out["words"][1]["start"] == 11 and out["words"][1]["end"] == 19
    assert abs(out["confidence"] - (91.0 + 85.0) / 2) < 1e-9
    with pytest.raises(ValueError, match="direct-extraction"):
        eng.process_page("not bytes")


def test_paddle_adapter_empty_result(monkeypatch):
    import sys
    import types

    import numpy as np

    class FakePaddleOCR:
        def __init__(self, **kw): ...
        def ocr(self, img, cls=True):
            return [None]  # paddle's empty-page shape

    fake = types.ModuleType("paddleocr")
    fake.PaddleOCR = FakePaddleOCR
    monkeypatch.setitem(sys.modules, "paddleocr", fake)

    from medical_and_charity_document_extraction_system_spark.functions import png
    from medical_and_charity_document_extraction_system_spark.operators.engines import create_engine

    eng = create_engine("paddleocr", language="zz")  # unknown -> en
    out = eng.process_page(png.encode_png(np.zeros((4, 4), np.uint8)))
    assert out["text"] == "" and out["words"] == [] and out["confidence"] == 0.0

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

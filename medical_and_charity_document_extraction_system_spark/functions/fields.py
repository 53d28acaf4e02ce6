"""Regex/rule field-span extraction.

The structured-span analog of the reference's word records
(/root/reference/backend/app/core/ocr_engines/easyocr_engine.py:79-91,
golden example storage/json_tasks/task_5.json): each span is
``(field, value, start, end, confidence)`` with 0-based character
offsets (``end`` exclusive) into the document's extracted full text,
standing in for the pixel bbox.

Fields are the ones visible in the reference's golden hospital-bill
fixture (patient name, physician, invoice number, dates, amounts) plus
the charity/medical additions from FIXTURES.md section 3.

Pure Python; called from pandas-UDF stages. Patterns are applied in
registry order, matches merged and sorted by (start, field).
"""

from __future__ import annotations

import re

# field -> compiled pattern; group(1) is the span value
FIELD_PATTERNS: dict[str, re.Pattern[str]] = {
    "patient_name": re.compile(r"Patient:\s+([A-Z][a-z]+ [A-Z][a-z]+)"),
    "donor_name": re.compile(r"Donor:\s+([A-Z][a-z]+ [A-Z][a-z]+)"),
    "invoice_number": re.compile(r"Invoice\s+(\d{5})\b"),
    "date": re.compile(r"\b(\d{2}/\d{2}/\d{2})\b"),
    "amount": re.compile(r"(\$\d{1,3}(?:,\d{3})*\.\d{2})"),
    "diagnosis_code": re.compile(r"\b([A-Z]\d{2}\.\d)\b"),
}

RULE_CONFIDENCE = 100.0  # rule-based extraction is certain (cf. the
# reference's direct-text path confidence=100.0, ocr_service.py:59-68)


def extract_spans(text: str | None, fields: tuple[str, ...] | None = None) -> list[dict]:
    if not text:
        return []
    names = fields if fields is not None else tuple(FIELD_PATTERNS)
    out: list[dict] = []
    for name in names:
        pat = FIELD_PATTERNS[name]
        for m in pat.finditer(text):
            out.append(
                {
                    "field": name,
                    "value": m.group(1),
                    "start": m.start(1),
                    "end": m.end(1),
                    "confidence": RULE_CONFIDENCE,
                }
            )
    out.sort(key=lambda s: (s["start"], s["field"]))
    return out

from medical_and_charity_document_extraction_system_spark.functions.fields import extract_spans


def test_all_fields_extracted_with_offsets():
    text = (
        "--- Page 1 ---\n"
        "Patient: Kemba Harris\n"
        "Invoice 12245 dated 07/30/23\n"
        "Total due: $1,902.05 (code J02.9)"
    )
    spans = extract_spans(text)
    by_field = {s["field"]: s for s in spans}
    assert by_field["patient_name"]["value"] == "Kemba Harris"
    assert by_field["invoice_number"]["value"] == "12245"
    assert by_field["date"]["value"] == "07/30/23"
    assert by_field["amount"]["value"] == "$1,902.05"
    assert by_field["diagnosis_code"]["value"] == "J02.9"
    # offsets are into the full text, end exclusive
    for s in spans:
        assert text[s["start"]:s["end"]] == s["value"]
    # sorted by start
    starts = [s["start"] for s in spans]
    assert starts == sorted(starts)


def test_donor_variant():
    spans = extract_spans("Donor: Aisha Khan gave $5.00")
    fields = {s["field"] for s in spans}
    assert fields == {"donor_name", "amount"}


def test_no_false_positives_on_lowercase_prose():
    assert extract_spans("the quick brown fox jumps over the lazy dog") == []


def test_empty_and_none():
    assert extract_spans("") == []
    assert extract_spans(None) == []


def test_amount_grouping():
    spans = extract_spans("owes $1,234,567.89 now")
    assert spans[0]["value"] == "$1,234,567.89"

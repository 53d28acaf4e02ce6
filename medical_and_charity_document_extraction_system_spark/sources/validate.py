"""Input validation — real implementations of the reference's empty
validator stubs (/root/reference/backend/app/core/validators/
file_validator.py is 1 line, json_validator.py is 0 lines; SURVEY.md
§2.7 calls for actual schema checks since our input schema is fixed).

Checks are structural (names/types/nullability) and run at plan time —
no data pass. The one data-touching check (`validate_pages_sample`)
reads a bounded sample, mirroring the reference's cheap-probe style
(scanned check samples <=3 pages, pdf_service.py:231-249).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PAGES_SCHEMA


class SchemaValidationError(ValueError):
    pass


def validate_pages_schema(df: DataFrame) -> DataFrame:
    """Raises SchemaValidationError unless df structurally matches the
    pages input table (url/warc_ts/html/text/lang with the right
    types). Extra columns are rejected too — they signal a wrong
    source. Returns df unchanged for chaining."""
    expected = {f.name: f.dataType.simpleString() for f in PAGES_SCHEMA.fields}
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    wrong = sorted(
        n for n in set(expected) & set(actual) if expected[n] != actual[n]
    )
    problems = []
    if missing:
        problems.append(f"missing columns: {missing}")
    if extra:
        problems.append(f"unexpected columns: {extra}")
    if wrong:
        problems.append(
            "type mismatches: "
            + ", ".join(f"{n} is {actual[n]} (want {expected[n]})" for n in wrong)
        )
    if problems:
        raise SchemaValidationError("; ".join(problems))
    return df


def validate_pages_sample(df: DataFrame, sample_rows: int = 100) -> dict:
    """Bounded data probe: url uniqueness/shape and payload presence
    over the first `sample_rows` rows. Returns a stats dict; raises on
    hard violations (null url)."""
    sample = df.limit(sample_rows).select(
        F.col("url").isNull().alias("null_url"),
        (~F.col("url").rlike(r"^[a-z]+://")).alias("bad_scheme"),
        (F.col("html").isNull() & F.col("text").isNull()).alias("empty_payload"),
    )
    agg = sample.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("null_url").cast("int")).alias("null_urls"),
        F.sum(F.col("bad_scheme").cast("int")).alias("bad_schemes"),
        F.sum(F.col("empty_payload").cast("int")).alias("empty_payloads"),
    ).first()
    if agg.null_urls:
        raise SchemaValidationError(f"{agg.null_urls} null urls in sample")
    return {
        "rows_sampled": agg.n,
        "bad_schemes": agg.bad_schemes or 0,
        "empty_payloads": agg.empty_payloads or 0,
    }

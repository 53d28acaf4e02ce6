"""PII / structured-field redaction for training-data hygiene.

A webtext corpus headed for model training scrubs personal and
sensitive spans; in this engine's domain (medical/charity documents)
those are exactly the fields the span extractor finds — names,
amounts, invoice numbers, dates, diagnosis codes — plus the generic
web PII shapes (emails, SSNs).

ONE rule table drives both execution engines: ``redact_text`` compiles
it to a chain of JVM ``regexp_replace`` columns (codegen'd, no
Python), and ``redact_sql_expr`` compiles the SAME table to nested
DuckDB ``regexp_replace(..., 'g')`` calls for the oracle gate —
patterns are restricted to the Java/RE2-identical subset (character
classes, bounded quantifiers, alternation; no lookaround), and
replacement backrefs are rewritten ``$N`` -> ``\\N`` for RE2.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement with $N backrefs) — order matters: the SSN
# shape must win before any looser digit rule added later
REDACTION_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (r"(Patient|Donor): [A-Z][a-z]+ [A-Z][a-z]+", "$1: <NAME>"),
    (r"\$[0-9][0-9,]*\.[0-9]{2}", "<AMOUNT>"),
    (r"Invoice [0-9]{5}", "Invoice <ID>"),
    (r"[0-9]{2}/[0-9]{2}/[0-9]{2}", "<DATE>"),
    (r"code [A-Z][0-9]{2}\.[0-9]", "code <ICD>"),
)


def redact_text(col: Column) -> Column:
    """Apply every redaction rule in order (each replaces ALL
    occurrences — Spark regexp_replace is global)."""
    out = col
    for pat, repl in REDACTION_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_sql_expr(expr: str) -> str:
    """The same rule chain as a nested DuckDB expression over
    ``expr`` ('g' flag = global, matching Spark; $N -> \\N)."""
    for pat, repl in REDACTION_RULES:
        duck_repl = _re.sub(r"\$(\d)", r"\\\1", repl).replace("'", "''")
        duck_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{duck_pat}', '{duck_repl}', 'g')"
    return expr


def redact_python(text: str) -> str:
    """Reference implementation for property tests (Python re is a
    third engine agreeing on the subset)."""
    for pat, repl in REDACTION_RULES:
        text = _re.sub(pat, _re.sub(r"\$(\d)", r"\\\1", repl), text)
    return text

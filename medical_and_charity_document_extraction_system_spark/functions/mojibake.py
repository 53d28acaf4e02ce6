"""Mojibake detection and repair (UTF-8-read-as-Latin-1 artifacts).

Web crawls are full of double-encoded text: a page was UTF-8, some
layer decoded it as ISO-8859-1, and every non-ASCII character became
a 2-3 character artifact ("cafÃ©" for "café", "â" + U+0080 + U+0094
for an em dash). This module is the ftfy-style
cleanup pass of the pipeline, built the same way as the PII pass
(functions/redact.py): ONE rule table, compiled to all three engines
— a JVM `F.replace` chain for Spark, a `replace(... chr(...) ...)`
chain for the DuckDB oracle, and plain `str.replace` for tests — so
the semantics cannot drift between the query and its twin.

The table is DERIVED, not hand-typed: for each supported character
``bad = good.encode("utf-8").decode("latin-1")``. Rules apply in a
fixed order, 3-byte artifacts before 2-byte ones, so a repaired
lead byte can never splice into a later rule's pattern. The rule
set is closed under application: no rule's output contains another
rule's input, so the chain is idempotent (property-tested).

Pure string replacement — zero shuffles, codegen-friendly, no
Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# characters the repair pass recovers; every one round-trips through
# utf-8 bytes -> latin-1 chars deterministically. 3-byte (punctuation)
# first, then 2-byte (accented letters).
MOJIBAKE_CHARS = "—–“”‘’…" + \
    "éèüñçï"

MOJIBAKE_RULES: list[tuple[str, str]] = [
    (ch.encode("utf-8").decode("latin-1"), ch) for ch in MOJIBAKE_CHARS
]

# deterministic accented suffix planted by the catalog query's
# construction — every non-ASCII char is in MOJIBAKE_CHARS, so the
# corrupt/repair round trip is exact
MOJIBAKE_PLANT = " café résumé — “quoted” naïve…"


def repair_mojibake(col: Column) -> Column:
    """JVM replace chain: every artifact sequence back to its char."""
    for bad, good in MOJIBAKE_RULES:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def corrupt_mojibake(col: Column) -> Column:
    """The inverse chain (good -> artifact), used to PLANT mojibake in
    deterministic test constructions. Safe to chain because no rule's
    good char appears in any rule's bad sequence."""
    for bad, good in MOJIBAKE_RULES:
        col = F.replace(col, F.lit(good), F.lit(bad))
    return col


def _sql_str(s: str) -> str:
    """A DuckDB expression for an arbitrary unicode string, emitted as
    chr() concatenation so generated SQL stays printable-ASCII."""
    return " || ".join(f"chr({ord(c)})" for c in s)


def repair_sql_expr(col: str) -> str:
    expr = col
    for bad, good in MOJIBAKE_RULES:
        expr = f"replace({expr}, {_sql_str(bad)}, {_sql_str(good)})"
    return expr


def corrupt_sql_expr(col: str) -> str:
    expr = col
    for bad, good in MOJIBAKE_RULES:
        expr = f"replace({expr}, {_sql_str(good)}, {_sql_str(bad)})"
    return expr


def repair_py(s: str) -> str:
    for bad, good in MOJIBAKE_RULES:
        s = s.replace(bad, good)
    return s


def corrupt_py(s: str) -> str:
    for bad, good in MOJIBAKE_RULES:
        s = s.replace(good, bad)
    return s

"""Registrable-domain (eTLD+1) extraction with a public-suffix rule
table.

Site-level operations — site dedup, per-site quality aggregation,
crawl politeness budgets — need the REGISTRABLE domain, not the raw
host: ``a.b.example.co.uk`` and ``c.example.co.uk`` are one site
(``example.co.uk``), while ``example.com`` and ``example.org`` are
two. The real public-suffix list is thousands of rules; this module
implements the exact matching semantics (longest matching suffix
wins, registrable = suffix + one label) over a compact built-in rule
set, following the repo's ONE-rule-table pattern (functions/
redact.py, mojibake.py): the same table compiles to a JVM CASE
chain, a DuckDB CASE chain, and plain Python, so the three engines
cannot drift.

Pure string expressions, zero shuffles, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# multi-label suffixes FIRST (longest-match precedence), then the
# single-label fallback is "last label" handled structurally
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in",
    "github.io", "blogspot.com",
)


def _last_labels(host: Column, n: int) -> Column:
    """The last ``n`` dot-separated labels of a host."""
    pat = r"([^.]+" + r"\.[^.]+" * (n - 1) + r")$"
    return F.regexp_extract(host, pat, 1)


def registrable_domain(host: Column) -> Column:
    """eTLD+1: for a host strictly below a known multi-label suffix,
    the suffix plus one label; otherwise the last two labels; a bare
    single-label host, or a host exactly equal to a suffix, passes
    through unchanged (no registrable label exists above it)."""
    expr = None
    for suf in MULTI_SUFFIXES:
        labels = suf.count(".") + 2  # suffix labels + 1 registrable
        # strictly BELOW the suffix: a host EQUAL to a suffix has no
        # registrable label above it and falls through to the
        # pass-through fallback (review finding: the equality branch
        # asked _last_labels for more labels than exist -> '')
        cond = host.endswith("." + suf)
        take = _last_labels(host, labels)
        expr = F.when(cond, take) if expr is None else expr.when(cond, take)
    two = _last_labels(host, 2)
    fallback = F.when(two == "", host).otherwise(two)
    return expr.otherwise(fallback)


def registrable_domain_sql(host: str) -> str:
    """The identical longest-match CASE chain for DuckDB."""

    def last(n: int) -> str:
        pat = "([^.]+" + r"\.[^.]+" * (n - 1) + ")$"
        return f"regexp_extract({host}, '{pat}', 1)"

    whens = []
    for suf in MULTI_SUFFIXES:
        labels = suf.count(".") + 2
        whens.append(f"WHEN {host} LIKE '%.{suf}' THEN {last(labels)}")
    body = " ".join(whens)
    return (
        f"CASE {body} ELSE (CASE WHEN {last(2)} = '' THEN {host} "
        f"ELSE {last(2)} END) END"
    )


def registrable_domain_py(host: str) -> str:
    import re

    for suf in MULTI_SUFFIXES:
        if host.endswith("." + suf):
            n = suf.count(".") + 2
            m = re.search(r"([^.]+" + r"\.[^.]+" * (n - 1) + r")$", host)
            return m.group(1) if m else host
    m = re.search(r"([^.]+\.[^.]+)$", host)
    return m.group(1) if m else host

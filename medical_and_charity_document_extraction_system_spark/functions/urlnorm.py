"""URL canonicalization for crawl dedup.

A recrawl sees the same page under many spellings — scheme variants,
host case, default ports, fragments, tracking parameters, trailing
slashes. Canonicalizing BEFORE exact/near dedup is the first dedup
stage of every web-corpus pipeline (it collapses the cheap duplicates
so the expensive MinHash stage sees fewer rows).

Everything here is JVM expressions (codegen'd; no Python): anchored
regexes from the Java/RE2-identical subset (character classes,
alternation — no lookaround, no pattern backrefs), plus
split/filter/join for the query string, which both engines express
natively. The SQL twin (oracles.url_dedup_sql) re-derives the same
form step for step — edit both together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters stripped wholesale (key + value)
TRACKING_KEY_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)="


def canonical_url(url: Column) -> Column:
    """Deterministic canonical form:

    1. drop the fragment (``#...``)
    2. lowercase scheme and host (path/query case preserved)
    3. ``http://`` -> ``https://``; strip default ports ``:80``/``:443``
    4. remove tracking query parameters (utm_*, fbclid, gclid, ...)
       and empty params via split/filter/join on ``&``
    5. strip trailing slashes from the path
    """
    u = F.regexp_replace(url, r"#.*$", "")
    scheme_host = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    u = F.concat(scheme_host, rest)
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^(https://[^/?:]+):(80|443)([/?]|$)", r"$1$3")
    base = F.regexp_replace(F.regexp_replace(u, r"\?.*$", ""), r"/+$", "")
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_KEY_RE),
    )
    q2 = F.array_join(kept, "&")
    return F.when(q2 == "", base).otherwise(F.concat(base, F.lit("?"), q2))

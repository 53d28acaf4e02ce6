"""DuckDB oracle SQL builders.

For every Spark query exposed through ``__spark_entry__.queries()``
these functions emit the equivalent ANSI SQL for the driver's
correctness gate. Two families:

1. **Construction oracles** for the extraction pipeline: the pages
   table is a deterministic pure function of ``documents.parquet``
   (sources/pages.py), so the expected extraction output — full text,
   totals, confidences, span values *and* char offsets — is
   reconstructed arithmetically in SQL, never by re-parsing HTML.
   This is the SQL twin of the reference's golden-fixture strategy
   (/root/reference/storage/json_tasks/).

2. **Expression twins** for the text/dedup/similarity analytics:
   operation-order-identical SQL so double results match Spark
   bit-for-bit (left-fold sums, same division order, no rounding).

Keep every formula in lock-step with sources/pages.py and
functions/textstats.py.
"""

from __future__ import annotations

from .functions.textstats import LANG_MARKERS, STOPWORDS
from .sources.pages import NAMES

NL = "chr(10)"
HDR1 = "'--- Page 1 ---' || chr(10)"

# ---------------------------------------------------------------- pages
_NAME_CASE = (
    "CASE (doc_id % 20) "
    + " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(NAMES))
    + " END"
)


def base_cte() -> str:
    """CTE ``base``: every deterministic component of the synthesized
    page + expected extraction, one row per document."""
    return f"""
base AS (
  SELECT
    doc_id,
    text,
    lang,
    (doc_id * 31) % 100                       AS m,
    (doc_id * 131) % 100                      AS hmod,
    {_NAME_CASE}                              AS name,
    CASE WHEN doc_id % 2 = 0 THEN 'Patient: ' ELSE 'Donor: ' END AS prefix,
    CAST(10000 + (doc_id * 7919) % 90000 AS VARCHAR)             AS inv,
    printf('%02d/%02d/23', CAST(1 + doc_id % 12 AS INT), CAST(1 + doc_id % 28 AS INT)) AS dt,
    (doc_id * 9973) % 1000000                 AS cents,
    chr(CAST(65 + doc_id % 26 AS INT)) || printf('%02d', doc_id % 100)
      || '.' || CAST(doc_id % 10 AS VARCHAR)  AS icd,
    'scan ' || CAST(doc_id AS VARCHAR)        AS scan_text
  FROM documents
),
parts AS (
  SELECT *,
    '$' || format('{{:,}}', cents // 100) || '.' || printf('%02d', cents % 100) AS amt,
    CASE WHEN hmod < 40 THEN 0 WHEN hmod < 60 THEN 1 WHEN hmod < 70 THEN 2
         ELSE 3 + hmod % 17 END AS hidx
  FROM base
),
doc AS (
  SELECT *,
    'https://host' || CAST(hidx AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    prefix || name AS l2,
    'Invoice ' || inv || ' dated ' || dt AS l3,
    'Total due: ' || amt || ' (code ' || icd || ')' AS l4
  FROM parts
),
rec AS (
  SELECT *,
    text || {NL} || l2 || {NL} || l3 || {NL} || l4 AS main,
    l2 || {NL} || l3 || {NL} || l4 AS p2
  FROM doc
)"""


_WORDS = "len(list_filter(regexp_split_to_array({s}, '\\s+'), x -> x <> ''))"


def _words(s: str) -> str:
    return _WORDS.format(s=s)


def extraction_doc_records_sql() -> str:
    """Expected document records (flagship oracle)."""
    return f"""
WITH {base_cte()}
SELECT
  doc_id,
  url,
  CASE WHEN m >= 10 AND m < 14 THEN TRUE ELSE FALSE END AS is_scanned,
  CASE WHEN m < 4 THEN 'direct_text_extraction'
       WHEN m < 10 THEN 'direct_text_extraction'
       WHEN m < 14 THEN 'ocr_pipeline'
       WHEN m < 16 THEN 'error'
       ELSE 'html_extraction' END AS processing_method,
  CAST(CASE WHEN m >= 14 AND m < 16 THEN 0 WHEN m >= 4 AND m < 10 THEN 2 ELSE 1 END AS INT) AS page_count,
  CAST(CASE WHEN m >= 14 AND m < 16 THEN 0
            WHEN m >= 10 AND m < 14 THEN length(scan_text)
            WHEN m >= 4 AND m < 10 THEN length(text) + length(p2)
            ELSE length(main) END AS BIGINT) AS total_characters,
  CAST(CASE WHEN m >= 14 AND m < 16 THEN 0
            WHEN m >= 10 AND m < 14 THEN {_words('scan_text')}
            WHEN m >= 4 AND m < 10 THEN {_words('text')} + {_words('p2')}
            ELSE {_words('main')} END AS BIGINT) AS total_words,
  CAST(CASE WHEN m >= 14 AND m < 16 THEN 0.0
            WHEN m >= 10 AND m < 14 THEN 80 + length(scan_text) % 20
            ELSE 100.0 END AS DOUBLE) AS average_confidence,
  CASE WHEN m >= 14 AND m < 16 THEN ''
       WHEN m >= 10 AND m < 14 THEN {HDR1} || scan_text
       WHEN m >= 4 AND m < 10 THEN {HDR1} || text || {NL} || {NL} || '--- Page 2 ---' || {NL} || p2
       ELSE {HDR1} || main END AS text,
  CASE WHEN m < 4 THEN 'text' WHEN m < 10 THEN 'text' WHEN m < 14 THEN 'stub'
       WHEN m < 16 THEN 'none' ELSE 'density_v1' END AS engine,
  lang
FROM rec
"""


def extraction_spans_sql() -> str:
    """Expected exploded field spans with 0-based char offsets into the
    document full text (end exclusive). Span layout mirrors
    sources/pages.py content_lines: header(15) + text + separator +
    'Patient: '/'Donor: ' name / 'Invoice ' inv ' dated ' dt /
    'Total due: ' amt ' (code ' icd ')'."""
    return f"""
WITH {base_cte()},
pos AS (
  SELECT *,
    CASE WHEN m >= 4 AND m < 10
         THEN 15 + length(text) + 2 + 15   -- pdf: hdr1+text+\\n\\n+hdr2
         ELSE 15 + length(text) + 1        -- html/direct: hdr1+text+\\n
    END AS l2pos
  FROM rec
  WHERE m < 10 OR m >= 16
),
pos2 AS (
  SELECT *,
    l2pos + length(l2) + 1 AS l3pos,
    l2pos + length(l2) + 1 + length(l3) + 1 AS l4pos
  FROM pos
)
SELECT doc_id, field, value,
       CAST(span_start AS INT) AS span_start,
       CAST(span_end AS INT) AS span_end
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'patient_name' ELSE 'donor_name' END AS field,
         name AS value,
         l2pos + length(prefix) AS span_start,
         l2pos + length(prefix) + length(name) AS span_end
  FROM pos2
  UNION ALL
  SELECT doc_id, 'invoice_number', inv, l3pos + 8, l3pos + 8 + 5 FROM pos2
  UNION ALL
  SELECT doc_id, 'date', dt, l3pos + 8 + 5 + 7, l3pos + 8 + 5 + 7 + 8 FROM pos2
  UNION ALL
  SELECT doc_id, 'amount', amt, l4pos + 11, l4pos + 11 + length(amt) FROM pos2
  UNION ALL
  SELECT doc_id, 'diagnosis_code', icd,
         l4pos + 11 + length(amt) + 7,
         l4pos + 11 + length(amt) + 7 + 5
  FROM pos2
)
"""


# ------------------------------------------------------- analytics twins
def rollup_source_sql() -> str:
    return """
WITH t AS (
  SELECT source, text, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS pn
  FROM documents
)
SELECT source,
       CAST(count(*) AS INT) AS page_count,
       CAST(sum(n_chars) AS BIGINT) AS total_characters,
       string_agg('--- Page ' || CAST(pn AS VARCHAR) || ' ---' || chr(10) || text,
                  chr(10) || chr(10) ORDER BY pn) AS text
FROM t
GROUP BY source
"""


_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def token_count_sql() -> str:
    return f"SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents"


def _in_list(words: tuple[str, ...]) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, x -> x IN ({lits})))"


def quality_score_sql() -> str:
    stop = _in_list(STOPWORDS)
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
r AS (
  SELECT doc_id,
    len(toks) AS n,
    {stop} / len(toks) AS stop_ratio,
    (length(text) - length(regexp_replace(text, '[^a-z0-9\\s]', '', 'g'))) / length(text) AS punct
  FROM t
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_tokens,
  stop_ratio AS stopword_ratio,
  punct AS punct_ratio,
  0.4 * least(n / 100.0, 1.0) + 0.4 * (1.0 - stop_ratio) + 0.2 * (1.0 - punct) AS quality
FROM r
"""


def lang_guess_sql() -> str:
    c = {lang: _in_list(words) for lang, words in LANG_MARKERS.items()}
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id, {c['en']} AS c_en, {c['de']} AS c_de, {c['fr']} AS c_fr, {c['es']} AS c_es FROM t)
SELECT doc_id,
  CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'und'
       WHEN c_en >= greatest(c_de, c_fr, c_es) THEN 'en'
       WHEN c_de >= greatest(c_fr, c_es) THEN 'de'
       WHEN c_fr >= c_es THEN 'fr'
       ELSE 'es' END AS lang_guess
FROM c
"""


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


def exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS fp,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keeper
FROM documents GROUP BY md5(text)
"""


_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
    "generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    " ELSE [] END"
)


def ngram_jaccard_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh)) AS jaccard
FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
WHERE len(a.sh) > 0 AND len(b.sh) > 0
"""


_DOT = (
    "list_reduce(list_transform(generate_series(1, {n}), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)


def _cos(a: str, b: str, n: int = 64) -> str:
    dot = _DOT.format(n=n, a=a, b=b)
    na = _DOT.format(n=n, a=a, b=a)
    nb = _DOT.format(n=n, a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def topk_cosine_sql(k: int = 10, query_vec_id: int = 0) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id, {_cos('v', 'qv')} AS cos_sim
FROM e, q
WHERE vec_id <> {query_vec_id}
ORDER BY cos_sim DESC, vec_id
LIMIT {k}
"""


def embedding_near_dup_sql(threshold: float = 0.3) -> str:
    # pre-normalized form: must stay in IEEE lock-step with
    # q_embedding_near_dup (norm per row, one fold-dot per pair)
    norm = _DOT.format(n=64, a="v", b="v")
    dot = _DOT.format(n=64, a="a.vn", b="b.vn")
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (SELECT vec_id, sqrt({norm}) AS nrm, v FROM e),
vn AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM n)
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {dot} AS cos_sim
  FROM vn a JOIN vn b ON a.vec_id < b.vec_id
) WHERE cos_sim > {threshold}
"""


def minhash_near_dup_sql(threshold: float = 0.9) -> str:
    """True all-pairs n-gram Jaccard >= threshold. The Spark side goes
    through MinHash banding + verification; at j>=0.9 with 64 hashes /
    16 bands the LSH miss probability is ~1e-12, so the verified output
    equals the exact pair set."""
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh)) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(a.sh) > 0 AND len(b.sh) > 0
  AND len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh)) >= {threshold}
"""


def events_tumbling_sql() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def merge_sources_sql() -> str:
    """Twin of operators/maintenance.merge_sources (reference
    merge_pdfs, pdf_service.py:23-85): UNION ALL of the two halves,
    then the A4 page-count aggregation."""
    return """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT * FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT * FROM documents WHERE doc_id % 2 = 1
)
GROUP BY source
"""


def retention_cleanup_sql(cutoff: str = "2024-01-15 00:00:00") -> str:
    """Twin of operators/maintenance.retention_filter (reference
    cleanup_files, file_utils.py:75-126): survivors per event_type."""
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
FROM events WHERE ts >= TIMESTAMP '{cutoff}'
GROUP BY event_type
"""


def pdf_pages_sql() -> str:
    """Construction oracle for the F1/F2 page explode: pdf_text docs
    (m in [4,10)) have pages [text, p2]; pdf_scanned (m in [10,14))
    a single scan_text page (sources/pages.py bucket/payload rules)."""
    return f"""
WITH {base_cte()}
SELECT doc_id, page_number, page_text,
       CAST(length(page_text) AS INT) AS char_count
FROM (
  SELECT doc_id, 1 AS page_number, text AS page_text
  FROM rec WHERE m >= 4 AND m < 10
  UNION ALL
  SELECT doc_id, 2 AS page_number, p2 AS page_text
  FROM rec WHERE m >= 4 AND m < 10
  UNION ALL
  SELECT doc_id, 1 AS page_number, scan_text AS page_text
  FROM rec WHERE m >= 10 AND m < 14
)
"""


def bpe_token_count_sql() -> str:
    return r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def host_quality_sql() -> str:
    """Construction oracle for plans/metrics.host_quality_metrics over
    the extraction output: per-doc error/scanned/confidence/span-count
    values are pure functions of doc_id (sources/pages.py), aggregated
    by host. All averaged values are integers, so double sums are
    exact in any order and the single final division matches Spark
    bit-for-bit."""
    return f"""
WITH {base_cte()}
SELECT
  'host' || CAST(hidx AS VARCHAR) || '.example.com' AS host,
  CAST(count(*) AS BIGINT) AS docs,
  avg(CASE WHEN m >= 14 AND m < 16 THEN 1.0 ELSE 0.0 END) AS error_share,
  avg(CASE WHEN m >= 10 AND m < 14 THEN 1.0 ELSE 0.0 END) AS scanned_share,
  avg(CASE WHEN m >= 14 AND m < 16 THEN 0.0
           WHEN m >= 10 AND m < 14 THEN 80 + length(scan_text) % 20
           ELSE 100.0 END) AS avg_confidence,
  avg(CASE WHEN m >= 10 AND m < 16 THEN 0.0 ELSE 5.0 END) AS avg_spans,
  CAST(sum(CASE WHEN m >= 14 AND m < 16 THEN 0
                WHEN m >= 10 AND m < 14 THEN length(scan_text)
                WHEN m >= 4 AND m < 10 THEN length(text) + length(p2)
                ELSE length(main) END) AS BIGINT) AS total_chars
FROM rec
GROUP BY 1
"""


def ocr_words_sql() -> str:
    """Construction oracle for the exploded OCR word records (F3):
    scanned docs' single page text is 'scan ' || doc_id, so the two
    word records and their char offsets are pure doc_id arithmetic;
    confidence matches the stub engine's 80 + len % 20."""
    return f"""
WITH {base_cte()}
SELECT doc_id, CAST(1 AS INT) AS page_number,
       CAST(word_num AS INT) AS word_num, word,
       CAST(w_start AS INT) AS w_start, CAST(w_end AS INT) AS w_end,
       CAST(80 + length(scan_text) % 20 AS DOUBLE) AS confidence
FROM (
  SELECT doc_id, scan_text, 1 AS word_num, 'scan' AS word,
         0 AS w_start, 4 AS w_end
  FROM rec WHERE m >= 10 AND m < 14
  UNION ALL
  SELECT doc_id, scan_text, 2 AS word_num, CAST(doc_id AS VARCHAR) AS word,
         5 AS w_start, 5 + length(CAST(doc_id AS VARCHAR)) AS w_end
  FROM rec WHERE m >= 10 AND m < 14
)
"""


def route_stats_sql() -> str:
    """Construction oracle for the routing distribution (P1): bucket
    membership and per-bucket page counts/chars are doc_id arithmetic
    (sources/pages.py bucket rules)."""
    return f"""
WITH {base_cte()}
SELECT
  CASE WHEN m < 10 THEN 'direct_text_extraction'
       WHEN m < 14 THEN 'ocr_pipeline'
       WHEN m < 16 THEN 'error'
       ELSE 'html_extraction' END AS processing_method,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN m >= 14 AND m < 16 THEN 0
                WHEN m >= 4 AND m < 10 THEN 2 ELSE 1 END) AS BIGINT) AS n_pages,
  CAST(sum(CASE WHEN m >= 14 AND m < 16 THEN 0
                WHEN m >= 10 AND m < 14 THEN length(scan_text)
                WHEN m >= 4 AND m < 10 THEN length(text) + length(p2)
                ELSE length(main) END) AS BIGINT) AS sum_chars
FROM rec
GROUP BY 1
"""


_BUCKET = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000")


def sample_10pct_sql() -> str:
    """Twin of operators/sampling.deterministic_sample(fraction=0.1):
    identical md5-prefix bucket arithmetic in both engines."""
    return f"SELECT doc_id FROM documents WHERE {_BUCKET} < 1000"


def split_counts_sql() -> str:
    """Twin of operators/sampling.assign_split(0.8/0.1/0.1)."""
    return f"""
WITH b AS (SELECT doc_id, n_chars, {_BUCKET} AS bkt FROM documents)
SELECT CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1
"""


def top_docs_per_source_sql(k: int = 3) -> str:
    """Per-key top-N (window rank) twin."""
    return f"""
SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rk
FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
WHERE rk <= {k}
"""

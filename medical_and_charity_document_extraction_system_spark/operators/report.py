"""Corpus health report — the per-source ops summary a 100 TB
pipeline publishes after every build (docs, tokens, bytes, language
spread, exact-duplicate rate, mean length).

The reference system reports per-request metrics only
(reference backend/app/api/routes/ocr_routes.py handles one document
per call); a corpus-scale engine needs the table-level rollup.

Float discipline: there are NO floats. Every rate is an exact
integer — duplicate rate in basis points and mean tokens x100 are
single integer divisions ((a * 10000) DIV b), reproducible in any
engine, the temperature_mix/hist_quantiles rule.

Scale shape: ONE map-side-combinable aggregation keyed by source
(count / sum / count-distinct over md5 and lang). The two
count-distincts expand to Spark's standard two-phase partial
aggregate (Expand + partial agg before the shuffle), so no key ever
concentrates more than its source's row share; there is no window,
no join, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus summary: doc/token/char totals, distinct
    languages, exact-duplicate count (by text md5) and its
    basis-point rate, and mean tokens x100 — all exact integers."""
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("_lang"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_ntok"),
        F.length(F.col(text_col)).cast("long").alias("_nchr"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_fp"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.sum("_nchr").cast("long").alias("n_chars"),
        F.countDistinct("_lang").cast("long").alias("n_langs"),
        F.countDistinct("_fp").cast("long").alias("n_unique_texts"),
    )
    dup = F.col("n_docs") - F.col("n_unique_texts")
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_unique_texts",
        dup.alias("dup_docs"),
        F.expr("(n_docs - n_unique_texts) * 10000 DIV n_docs").alias("dup_bp"),
        F.expr("n_tokens * 100 DIV n_docs").alias("mean_tokens_x100"),
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level data profile (the ANALYZE/data-quality pass a
    pipeline runs on every new table): one row per column with row /
    null / distinct counts and the lexicographic min/max of the
    RENDERED value (every column is cast to string first, so the
    schema is uniform and the profile is engine-portable — numeric
    columns profile their decimal rendering, which is the documented
    semantics, not an accident).

    Plan shape: ONE scan. The stack() unpivot turns k columns into
    (column, value) rows inside the same projection — no Expand from
    stacking count-distincts, no per-column pass — then a single
    hash-agg keyed by column name (k keys total, trivially balanced:
    count-distinct's two-phase partial agg does the heavy lifting on
    the value side)."""
    cols = df.columns if columns is None else columns
    if not cols:
        raise ValueError("no columns to profile")
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    kv = df.select(
        F.expr(f"stack({len(cols)}, {pairs})").alias("column", "val")
    )
    return kv.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_str"),
        F.max("val").alias("max_str"),
    )


def simple_source_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, n_chars): the count/sum view of the corpus —
    deliberately restricted to the DISTRIBUTIVE aggregate class
    (counts and sums), which is exactly what incremental view
    maintenance can update from deltas alone. corpus_report's
    count-distinct columns are NOT in this class (they need per-key
    state); keep the two views separate on purpose."""
    return df.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
    )


def apply_report_deltas(
    base_report: DataFrame,
    changelog: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Incremental view maintenance: update a (source, n_docs,
    n_chars) report with a CDC changelog (change_type in insert /
    delete / update_before / update_after — the
    plans/snapstore.SnapshotTable.changelog shape) WITHOUT re-reading
    the table. insert/update_after rows add (+1 doc, +len chars);
    delete/update_before rows subtract — updates therefore cancel on
    doc count and contribute the exact char diff. Groups whose doc
    count reaches zero drop out, groups born in the delta appear.

    This is the materialized-view maintenance step of a snapshot
    pipeline: changelog cost tracks churn (file-granular CDC), the
    delta agg is map-side combinable on the group key, and the final
    merge is one full-outer join of two report-sized tables — the
    whole refresh never touches unchanged data."""
    sign = F.when(
        F.col("change_type").isin("insert", "update_after"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        changelog.select(
            F.col(group_col).alias("source"),
            sign.alias("sgn"),
            F.length(text_col).cast("long").alias("nc"),
        )
        .groupBy("source")
        .agg(
            F.sum("sgn").cast("long").alias("d_docs"),
            F.sum(F.col("sgn") * F.col("nc")).cast("long").alias("d_chars"),
        )
    )
    b = base_report.select(
        "source",
        F.col("n_docs").alias("b_docs"),
        F.col("n_chars").alias("b_chars"),
    )
    return (
        b.join(deltas, "source", "full")
        .select(
            "source",
            (F.coalesce("b_docs", F.lit(0)) + F.coalesce("d_docs", F.lit(0)))
            .cast("long")
            .alias("n_docs"),
            (F.coalesce("b_chars", F.lit(0)) + F.coalesce("d_chars", F.lit(0)))
            .cast("long")
            .alias("n_chars"),
        )
        .where(F.col("n_docs") > 0)
    )


def json_field_stats(
    events: DataFrame,
    field: str = "k",
    json_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured payload rollup: extract an integer field from a
    JSON string column (``get_json_object`` — JVM codegen, no Python;
    malformed/missing JSON yields NULL, counted separately) and
    aggregate per group. The event-properties parsing step every
    clickstream pipeline runs before its props columns get promoted
    to real columns. One map-side-combinable hash-agg; all outputs
    exact integers."""
    k = F.get_json_object(F.col(json_col), f"$.{field}").cast("long")
    return (
        events.select(F.col(group_col).alias("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_parsed"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
    )


PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_stats(
    events: DataFrame,
    event_types: tuple[str, ...] = PIVOT_EVENT_TYPES,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Wide per-entity activity matrix via a real pivot: one row per
    key, a count and an exact-decimal value sum per event type — the
    feature-matrix shape model trainers consume. The pivot value list
    is EXPLICIT (deterministic output schema, no extra distinct job);
    absent (key, type) combos yield count 0 and sum NULL — exactly
    what conditional aggregation produces, so the twin is FILTER
    aggs. One shuffle on the entity key."""
    base = events.select(
        F.col(key_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(value_col).cast("decimal(18,2)").alias("v"),
    )
    wide = (
        base.groupBy("user_id")
        .pivot("etype", list(event_types))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum"),
        )
    )
    out = [F.col("user_id")]
    for t in event_types:
        out.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"n_{t}"))
        out.append(F.col(f"{t}_sum").cast("double").alias(f"sum_{t}"))
    return wide.select(*out)


def dimensional_rollup(
    df: DataFrame,
    dims: list[str],
    count_alias: str = "n_docs",
    sum_col: str | None = None,
    sum_alias: str = "sum_val",
    mode: str = "cube",
) -> DataFrame:
    """Grouping-sets summary over ``dims``: CUBE (every dimension
    subset) or ROLLUP (prefix hierarchy) with Spark's native
    ``df.cube()/.rollup()`` — one Expand + one hash aggregation, the
    plan Catalyst generates for grouping sets (each input row fans
    out to its grouping-set combinations BEFORE the shuffle, so
    partial aggregation still applies and no post-shuffle re-agg per
    set is needed). ``grouping_id()`` disambiguates a rolled-up NULL
    from a data NULL; its bitmask (first dim = most significant)
    matches DuckDB's GROUPING(...) exactly, which is what the oracle
    twin uses. Counts and integer sums only — nothing for engines to
    disagree on.

    Scale shape: input x (dims+1 for rollup / 2^dims for cube) rows
    through one map-side-combinable agg; no window, no join. For
    high-cardinality dims prefer rollup (linear expansion) over cube.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias(count_alias)]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).cast("long").alias(sum_alias))
    grouped = df.cube(*dims) if mode == "cube" else df.rollup(*dims)
    return grouped.agg(
        F.grouping_id().cast("long").alias("gid"), *aggs
    ).select(*dims, "gid", count_alias, *([sum_alias] if sum_col else []))


def _fk_check(
    name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    orphans = fact.select(F.col(fk).alias("k")).join(
        dim.select(F.col(pk).alias("k")).distinct(), "k", "left_anti"
    )
    return fact.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_bad"))
    ).select(
        F.lit(name).alias("check"),
        F.col("n_rows").cast("long"),
        F.col("n_bad").cast("long"),
    )


def integrity_report(
    docs: DataFrame,
    embeddings: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """Referential-integrity and key-uniqueness audit across the
    harness tables: foreign-key orphan counts (left-anti joins — AQE
    broadcasts the distinct key projections), duplicate-primary-key
    counts, and a content-duplication probe (documents sharing a
    text md5). One row per check:
    (check, n_rows, n_bad, bad_bp) with the rate ONE integer
    basis-point floor division.

    The single-row aggs crossJoin into one row per check — constant-
    size, not a data crossJoin. At 100 TB each check is one scan of
    its fact table's key column (column-pruned) + a distinct build
    side far smaller than the fact."""
    dup_ids = (
        docs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_bad"))
    )
    dup_text = (
        docs.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_bad"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_rows"))
    checks = [
        _fk_check("lineitem.orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        _fk_check("orders.custkey->customer", orders, "o_custkey", customer, "c_custkey"),
        _fk_check("lineitem.partkey->part", lineitem, "l_partkey", part, "p_partkey"),
        _fk_check("embeddings.vecid->documents", embeddings, "vec_id", docs, "doc_id"),
        n_docs.crossJoin(dup_ids).select(
            F.lit("documents.docid unique").alias("check"),
            F.col("n_rows").cast("long"),
            F.col("n_bad").cast("long"),
        ),
        n_docs.crossJoin(dup_text).select(
            F.lit("documents.text unique").alias("check"),
            F.col("n_rows").cast("long"),
            F.col("n_bad").cast("long"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check",
        "n_rows",
        "n_bad",
        F.expr("n_bad * 10000 div greatest(n_rows, 1)").cast("long").alias("bad_bp"),
    )


def fd_discovery(df: DataFrame, columns: list[str]) -> DataFrame:
    """Functional-dependency discovery over a declared column set (the
    schema-inference pass of a data profiler): for every ordered pair
    (lhs, rhs), does lhs -> rhs hold, and how many lhs values violate
    it? lhs -> rhs holds iff no lhs value maps to two distinct rhs
    values.

    Values are compared on their RENDERED string form (the
    table_profile rule — uniform stack schema, engine-portable for
    the int/string columns this is meant for; NULL renders to NULL
    and groups as its own lhs value, while NULL rhs values are
    ignored by the distinct count in both engines).

    Plan shape: ONE scan. stack() emits k*(k-1) (pair, lhs_val,
    rhs_val) rows per input row inside the projection, then a hash-agg
    keyed by (pair, lhs_val) — uniformly distributed, map-side
    combinable — and a second agg onto the k*(k-1) pair domain. Never
    a per-pair rescan, never an Expand of stacked count-distincts."""
    if len(columns) < 2:
        raise ValueError("need at least two columns")
    arms = []
    for a in columns:
        for b in columns:
            if a != b:
                arms.append(
                    f"'{a}', '{b}', CAST(`{a}` AS STRING), CAST(`{b}` AS STRING)"
                )
    kv = df.select(
        F.expr(f"stack({len(arms)}, {', '.join(arms)})").alias(
            "lhs", "rhs", "lhs_val", "rhs_val"
        )
    )
    per_lhs = kv.groupBy("lhs", "rhs", "lhs_val").agg(
        F.countDistinct("rhs_val").alias("n_rhs")
    )
    return per_lhs.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating"),
        F.min(F.when(F.col("n_rhs") > 1, 0).otherwise(1))
        .cast("long")
        .alias("holds"),
    )


def inclusion_stats(
    tables: dict[str, DataFrame],
    pairs: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Inclusion-dependency discovery (the foreign-key-profiling twin
    of ``fd_discovery``): for each declared (child_table.child_col ->
    parent_table.parent_col) candidate, how many DISTINCT non-NULL
    child values are missing from the parent's value set, and does
    the inclusion hold? Values compare on their rendered string form
    (the table_profile rule); NULL child values are skipped, per the
    standard IND definition.

    Plan shape: each table is scanned ONCE — stack() unpivots only
    the columns any pair references, a distinct bounded by the value
    domains (map-side combinable), then ONE broadcast of the tiny
    pair list tags child-side slices and ONE left-anti equi-join on
    (parent_tbl, parent_col, val) finds the missing values. Never a
    per-pair rescan."""
    need: dict[str, list[str]] = {}
    for ct, cc, pt, pc in pairs:
        need.setdefault(ct, [])
        need.setdefault(pt, [])
        if cc not in need[ct]:
            need[ct].append(cc)
        if pc not in need[pt]:
            need[pt].append(pc)
    kvs = []
    for t, cols in need.items():
        arms = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
        kvs.append(
            tables[t]
            .select(F.expr(f"stack({len(cols)}, {arms})").alias("col", "val"))
            .where(F.col("val").isNotNull())
            .select(F.lit(t).alias("tbl"), "col", "val")
            .distinct()
        )
    kv = kvs[0]
    for x in kvs[1:]:
        kv = kv.unionByName(x)
    spark = next(iter(tables.values())).sparkSession
    pairs_df = spark.createDataFrame(
        [(f"{ct}.{cc}", f"{pt}.{pc}", ct, cc, pt, pc) for ct, cc, pt, pc in pairs],
        "child string, parent string, ct string, cc string,"
        " pt string, pc string",
    )
    child_vals = kv.join(
        F.broadcast(pairs_df),
        (kv["tbl"] == F.col("ct")) & (kv["col"] == F.col("cc")),
    ).select("child", "parent", "pt", "pc", "val")
    parent_kv = kv.select(
        F.col("tbl").alias("p_tbl"),
        F.col("col").alias("p_col"),
        F.col("val").alias("p_val"),
    )
    missing = child_vals.join(
        parent_kv,
        (F.col("pt") == F.col("p_tbl"))
        & (F.col("pc") == F.col("p_col"))
        & (F.col("val") == F.col("p_val")),
        "left_anti",
    )
    totals = child_vals.groupBy("child", "parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_child_values")
    )
    miss = missing.groupBy("child", "parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing")
    )
    return (
        totals.join(miss, ["child", "parent"], "left")
        .select(
            "child",
            "parent",
            "n_child_values",
            F.coalesce(F.col("n_missing"), F.lit(0))
            .cast("long")
            .alias("n_missing"),
        )
        .withColumn(
            "contained",
            F.when(F.col("n_missing") == 0, 1).otherwise(0).cast("long"),
        )
    )


def expectations_report(
    tables: dict[str, DataFrame],
    checks: list[tuple[str, str, str, int, int]],
) -> DataFrame:
    """Deequ-style data-quality constraint suite. Each check is
    (check_type, table, column, lo, hi):

    * ``row_count_min``  — observed = row count, passes if >= lo
    * ``not_null``       — observed = NULL count, passes if 0
    * ``unique``         — observed = rows minus distinct non-NULL
                           values (duplicate surplus), passes if 0
    * ``value_range``    — observed = rows outside [lo, hi] (as
                           DECIMAL(18,2) — exact band edges, the
                           forecast_revenue rule), passes if 0

    Plan shape: each table is scanned ONCE — all of its checks
    compile into a single aggregate row (conditional sums /
    count-distincts side by side), then the per-check rows unpivot
    from that one row via stack(). Adding a check adds an expression,
    never a scan. FK/containment checks are ``inclusion_stats``'s
    job — compose the two reports, don't re-implement joins here."""
    by_table: dict[str, list[tuple[str, str, str, int, int]]] = {}
    for c in checks:
        by_table.setdefault(c[1], []).append(c)
    outs = []
    for t, tchecks in by_table.items():
        aggs, arms = [], []
        for i, (kind, _, col, lo, hi) in enumerate(tchecks):
            if kind == "row_count_min":
                obs = F.count(F.lit(1))
                passed = f"CASE WHEN _o{i} >= {lo} THEN 1 ELSE 0 END"
            elif kind == "not_null":
                obs = F.sum(
                    F.when(F.col(col).isNull(), 1).otherwise(0)
                )
                passed = f"CASE WHEN _o{i} = 0 THEN 1 ELSE 0 END"
            elif kind == "unique":
                obs = F.sum(
                    F.when(F.col(col).isNotNull(), 1).otherwise(0)
                ) - F.countDistinct(F.col(col))
                passed = f"CASE WHEN _o{i} = 0 THEN 1 ELSE 0 END"
            elif kind == "value_range":
                v = F.col(col).cast("decimal(18,2)")
                obs = F.sum(
                    F.when(
                        v.isNotNull()
                        & (
                            (v < F.lit(str(lo)).cast("decimal(18,2)"))
                            | (v > F.lit(str(hi)).cast("decimal(18,2)"))
                        ),
                        1,
                    ).otherwise(0)
                )
                passed = f"CASE WHEN _o{i} = 0 THEN 1 ELSE 0 END"
            else:
                raise ValueError(f"unknown check type: {kind}")
            aggs.append(obs.cast("long").alias(f"_o{i}"))
            target = f"{t}.{col}" if col else t
            arms.append(
                f"'{kind}', '{target}', CAST(_o{i} AS BIGINT),"
                f" CAST({passed} AS BIGINT)"
            )
        one = tables[t].agg(*aggs)
        outs.append(
            one.select(
                F.expr(
                    f"stack({len(arms)}, {', '.join(arms)})"
                ).alias("check_type", "target", "observed", "passed")
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def skew_report(
    df: DataFrame, key_col: str, k: int = 10
) -> DataFrame:
    """Join-key skew diagnostic (what you run BEFORE a big join to
    decide salting): per-key row counts, the k heaviest keys with
    their share in basis points, and the skew factor max/mean as an
    integer percentage (max * n_keys * 100 div n_rows — cross-
    multiplied, no float). One map-side-combinable count agg; the
    global stats re-aggregate the count table; top-k is
    TakeOrdered(k) on (cnt DESC, key) — per-partition heaps, no
    global sort. NULL keys count as a key (they hash-partition
    together too — exactly why they matter in a skew audit)."""
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(k)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.expr("cnt * 10000 div n_rows").cast("long").alias("share_bp"),
        "n_keys",
        "n_rows",
        F.expr("max_cnt * n_keys * 100 div n_rows")
        .cast("long")
        .alias("skew_x100"),
    )

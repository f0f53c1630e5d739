r"""HiveQL-text mini-qfile suite — the reference's PRIMARY interface.

Every other query family exercises the DataFrame API; this module
proves the *textual* SQL surface the reference exposes through
``parse/HiveParser.g`` (2,421 lines) and tests with 2,172 qfiles
(``ql/src/test/queries/clientpositive/*.q``). Each query here is one
``spark.sql(...)`` call whose text uses Hive-dialect constructs —
LATERAL VIEW, DISTRIBUTE/SORT/CLUSTER BY, multi-insert FROM…INSERT,
TRANSFORM…USING, GROUPING SETS, LEFT SEMI JOIN, MAPJOIN hint —
parsed by Spark's SQL parser, which keeps Hive's grammar for all of
these. Temp views registered by ``catalog.register_views`` give the
text the same table names the DuckDB oracle uses.

Scale: identical plans to the DataFrame twins (Catalyst compiles both
to the same logical operators), so every pushdown/broadcast/partial-
agg property proven there holds here; nothing below adds a shuffle
the DataFrame form doesn't have.
"""

from __future__ import annotations

from ..scratch import scratch_dir
from .registry import register


@register(
    "hiveql_lateral_view",
    oracle=r"""
SELECT doc_id, w, count(*) AS n
FROM documents,
     UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
                        x -> x <> '')) AS u(w)
GROUP BY doc_id, w
""",
    category="hiveql",
)
def hiveql_lateral_view(spark, t):
    """``LATERAL VIEW explode(...)`` as SQL text
    (HiveParser.g lateralView rule; qfile
    ``clientpositive/lateral_view.q``). UDTF + forward in one
    statement — word counts per document."""
    t.documents  # ensure view registered even on cache-hit sessions
    return spark.sql(
        r"""
        SELECT doc_id, w, count(*) AS n
        FROM documents
        LATERAL VIEW explode(split(lower(text), '\\s+')) tok AS w
        WHERE w <> ''
        GROUP BY doc_id, w
        """
    )


@register(
    "hiveql_distribute_sort",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders WHERE o_totalprice > 400000
""",
    category="hiveql",
)
def hiveql_distribute_sort(spark, t):
    """``DISTRIBUTE BY … SORT BY …`` as SQL text (HiveLexer.g:93-95,
    genReduceSinkPlan SemanticAnalyzer.java:7190). Row SET is the
    checkable contract; per-partition order is an execution property
    (driver compare is order-insensitive — Hive SORT_QUERY_RESULTS)."""
    t.orders
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 400000
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """
    )


@register(
    "hiveql_cluster_by",
    oracle="""
SELECT l_suppkey, count(*) AS n
FROM lineitem GROUP BY l_suppkey
""",
    category="hiveql",
)
def hiveql_cluster_by(spark, t):
    """``CLUSTER BY`` as SQL text (= DISTRIBUTE BY + SORT BY on the
    same keys, HiveLexer.g:95) over an aggregate."""
    t.lineitem
    return spark.sql(
        """
        SELECT l_suppkey, count(*) AS n
        FROM lineitem GROUP BY l_suppkey
        CLUSTER BY l_suppkey
        """
    )


@register(
    "hiveql_multi_insert",
    oracle="""
SELECT 'big' AS sink, o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 450000
UNION ALL
SELECT 'urgent' AS sink, o_orderkey, o_totalprice FROM orders
WHERE o_orderpriority = 'URGENT' AND o_totalprice > 420000
""",
    category="hiveql",
)
def hiveql_multi_insert(spark, t):
    """Multi-insert ``FROM src INSERT OVERWRITE TABLE t1 …
    INSERT OVERWRITE TABLE t2 …`` as ONE SQL statement
    (HiveParser.g fromStatement/multi-insert; qfile
    ``clientpositive/groupby1.q:12`` and ``input12.q``) — the source
    is scanned once and feeds both sinks. Targets are real catalog
    tables on scratch paths; the returned union reads both back so
    the oracle certifies both writes."""
    t.orders
    d = scratch_dir("hiveql_mi_")
    for name, where in (
        ("hiveql_mi_big", "o_totalprice > 450000"),
        ("hiveql_mi_urgent", "o_orderpriority = 'URGENT' AND o_totalprice > 420000"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"""
            CREATE TABLE {name} USING parquet LOCATION '{d}/{name}'
            AS SELECT o_orderkey, o_totalprice FROM orders
            WHERE {where} LIMIT 0
            """
        )
    spark.sql(
        """
        FROM orders
        INSERT OVERWRITE TABLE hiveql_mi_big
          SELECT o_orderkey, o_totalprice WHERE o_totalprice > 450000
        INSERT OVERWRITE TABLE hiveql_mi_urgent
          SELECT o_orderkey, o_totalprice
          WHERE o_orderpriority = 'URGENT' AND o_totalprice > 420000
        """
    )
    return spark.sql(
        """
        SELECT 'big' AS sink, o_orderkey, o_totalprice FROM hiveql_mi_big
        UNION ALL
        SELECT 'urgent' AS sink, o_orderkey, o_totalprice FROM hiveql_mi_urgent
        """
    )


@register(
    "hiveql_transform",
    oracle="""
SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name_out
FROM nation
""",
    category="hiveql",
)
def hiveql_transform(spark, t):
    """``SELECT TRANSFORM(…) USING 'cmd' AS (…)`` as raw SQL text
    (ScriptOperator.java:64; qfile ``clientpositive/transform1.q``).
    ``cat`` is the identity script — rows stream through the child
    process's stdin/stdout in Hive's tab-delimited script encoding,
    so the round-trip proves the serialization contract itself."""
    t.nation
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name)
        USING 'cat' AS (k string, name_out string)
        FROM nation
        """
    )


@register(
    "hiveql_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    category="hiveql",
)
def hiveql_grouping_sets(spark, t):
    """Hive grouping-sets *syntax* — ``GROUP BY a, b GROUPING SETS
    (…)`` with the GROUPING__ID virtual column
    (HiveLexer.g:282, metadata/VirtualColumn.java:65; qfile
    ``clientpositive/groupby_grouping_sets1.q``)."""
    t.lineitem
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "hiveql_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
""",
    category="hiveql",
)
def hiveql_semi_join(spark, t):
    """``LEFT SEMI JOIN`` as SQL text (HiveParser.g joinToken;
    qfile ``clientpositive/semijoin.q``) — Hive's only pre-0.13 way
    to write an existential join."""
    t.customer, t.orders
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c LEFT SEMI JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
        """
    )


@register(
    "hiveql_mapjoin_hint",
    oracle="""
SELECT n_name, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    category="hiveql",
)
def hiveql_mapjoin_hint(spark, t):
    """``/*+ MAPJOIN(n) */`` broadcast hint as SQL text — Hive's
    MapJoinProcessor hint (``optimizer/MapJoinProcessor.java:71``;
    qfile ``clientpositive/mapjoin_hint.q``). Spark's parser accepts
    the MAPJOIN hint name natively and plans a broadcast-hash join
    (plan-gated in tests/test_hiveql.py)."""
    t.customer, t.nation
    return spark.sql(
        """
        SELECT /*+ MAPJOIN(n) */ n.n_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "hiveql_window_topk",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) x WHERE rnk <= 2
""",
    category="hiveql",
)
def hiveql_window_topk(spark, t):
    """Windowing as SQL text — PTF invocation through the parser
    (PTFOperator.java:47; qfile ``clientpositive/windowing_rank.q``):
    top-2 orders per customer, deterministic via the o_orderkey
    tiebreak."""
    t.orders
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        ) x WHERE rnk <= 2
        """
    )


@register(
    "hiveql_cte_chain",
    oracle="""
WITH big AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spend FROM big WHERE spend > 1500000
)
SELECT c.c_custkey, c.c_name, r.spend
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
""",
    category="hiveql",
)
def hiveql_cte_chain(spark, t):
    """Chained WITH clauses as SQL text (HiveParser.g withClause;
    qfile ``clientpositive/cte_2.q``) — CTE referencing CTE, then a
    join against a base table."""
    t.orders, t.customer
    return spark.sql(
        """
        WITH big AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS spend
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, spend FROM big WHERE spend > 1500000
        )
        SELECT c.c_custkey, c.c_name, r.spend
        FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        """
    )


@register(
    "hiveql_correlated_exists",
    oracle="""
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity = 50
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_suppkey = s.s_suppkey
    AND l2.l_quantity = 50 AND l2.l_discount > 0.09
)
""",
    category="hiveql",
)
def hiveql_correlated_exists(spark, t):
    """Correlated EXISTS + NOT EXISTS as SQL text
    (SemanticAnalyzer subquery rewrite to semi/anti join;
    qfile ``clientpositive/subquery_exists.q``)."""
    t.supplier, t.lineitem
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity = 50
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_suppkey = s.s_suppkey
            AND l2.l_quantity = 50 AND l2.l_discount > 0.09
        )
        """
    )


@register(
    "hiveql_union_mixed",
    oracle="""
SELECT k, src FROM (
  SELECT n_nationkey AS k, 'nation' AS src FROM nation
  UNION ALL
  SELECT r_regionkey AS k, 'region' AS src FROM region
  UNION
  SELECT s_nationkey AS k, 'supplier' AS src FROM supplier
)
""",
    category="hiveql",
)
def hiveql_union_mixed(spark, t):
    """Mixed UNION ALL / UNION [DISTINCT] precedence as SQL text
    (HiveParser.g:2131-2135 — Hive 1.2 added UNION DISTINCT;
    qfile ``clientpositive/union34.q``). The DISTINCT applies to the
    whole accumulated branch set, same in both dialects."""
    t.nation, t.region, t.supplier
    return spark.sql(
        """
        SELECT k, src FROM (
          SELECT n_nationkey AS k, 'nation' AS src FROM nation
          UNION ALL
          SELECT r_regionkey AS k, 'region' AS src FROM region
          UNION
          SELECT s_nationkey AS k, 'supplier' AS src FROM supplier
        )
        """
    )


@register(
    "hiveql_tablesample_bucket",
    oracle="""
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 8 = 3
""",
    category="hiveql",
)
def hiveql_tablesample_bucket(spark, t):
    """Deterministic TABLESAMPLE(BUCKET x OUT OF y ON col) semantics
    as SQL text (FromClauseParser.g:167; qfile
    ``clientpositive/sample2.q``): Hive's ON-column form buckets by
    the column VALUE, so the key-mod predicate is the exact portable
    equivalent (Spark's TABLESAMPLE is percent/rows-based — the
    bucket form is expressed through its defining predicate)."""
    t.orders
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderkey % 8 = 3
        """
    )


@register(
    "hiveql_null_ordering",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS p
FROM orders WHERE o_orderkey <= 200
ORDER BY p ASC NULLS FIRST, o_orderkey
""",
    category="hiveql",
)
def hiveql_null_ordering(spark, t):
    """NULL ordering parity as SQL text: Hive sorts NULLs FIRST on
    ASC (``SemanticAnalyzer.java`` genReduceSinkPlan's nullOrder
    default), which is also Spark's default — pinned explicitly so
    the contract survives either engine changing its default."""
    t.orders
    return spark.sql(
        """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey <= 200
        ORDER BY p ASC NULLS FIRST, o_orderkey
        """
    )


@register(
    "hiveql_case_cast_expr",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'partial' END AS status_word,
       CAST(TRUNC(o_totalprice) AS BIGINT) AS price_floor,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d
FROM orders WHERE o_orderkey <= 500
""",
    category="hiveql",
)
def hiveql_case_cast_expr(spark, t):
    """Simple-CASE (value-match form) + CAST chains as SQL text
    (HiveParser.g caseExpression; qfile ``clientpositive/udf_case.q``).
    CAST(double AS BIGINT) truncates toward zero in Hive/Spark (ANSI
    off — legacy cast); DuckDB's cast ROUNDS, so the oracle spells
    the truncation as CAST(TRUNC(x) AS BIGINT)."""
    t.orders
    return spark.sql(
        """
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'partial' END AS status_word,
               CAST(o_totalprice AS BIGINT) AS price_floor,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS d
        FROM orders WHERE o_orderkey <= 500
        """
    )


@register(
    "hiveql_order_by_pos",
    oracle="""
SELECT o_orderpriority AS prio, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders WHERE o_orderdate >= DATE '1995-01-01'
GROUP BY 1 ORDER BY 2 DESC, 1
""",
    category="hiveql",
)
def hiveql_order_by_pos(spark, t):
    """Positional GROUP BY / ORDER BY ordinals as SQL text (reference
    ``hive.groupby.orderby.position.alias`` —
    ``SemanticAnalyzer.java`` getGroupByForClause resolving integer
    ordinals against the select list; qfile
    ``clientpositive/groupby_position.q``). Spark resolves ordinals
    natively (spark.sql.groupByOrdinal / orderByOrdinal, both on by
    default); DuckDB likewise — three engines, one text."""
    t.orders
    return spark.sql(
        """
        SELECT o_orderpriority AS prio, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS revenue
        FROM orders WHERE o_orderdate >= DATE '1995-01-01'
        GROUP BY 1 ORDER BY 2 DESC, 1
        """
    )


@register(
    "hiveql_having_alias",
    oracle="""
SELECT l_suppkey, count(*) AS n_lines
FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 40
""",
    category="hiveql",
)
def hiveql_having_alias(spark, t):
    """HAVING referencing a SELECT-list alias as SQL text (Hive
    resolves aliases in HAVING — ``SemanticAnalyzer.java``
    genHavingPlan; qfile ``clientpositive/having.q``). Spark accepts
    the same alias reference (resolved against the aggregate child);
    the oracle restates the aggregate since DuckDB also allows
    either form."""
    t.lineitem
    return spark.sql(
        """
        SELECT l_suppkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey HAVING n_lines >= 40
        """
    )


@register(
    "hiveql_create_view_text",
    oracle="""
SELECT o_orderpriority, count(*) AS n_urgent_lines
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND l_quantity >= 30
GROUP BY o_orderpriority
""",
    category="hiveql",
)
def hiveql_create_view_text(spark, t):
    """``CREATE [TEMPORARY] VIEW ... AS SELECT`` as SQL text
    (HiveParser.g createViewStatement; qfile
    ``clientpositive/create_view.q``): the view body is a join, the
    consumer aggregates THROUGH the view — proving view expansion
    composes with the optimizer (filters/joins inside the view
    inline into the outer plan; no materialization)."""
    t.orders
    t.lineitem
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW urgent_lines_v AS
        SELECT o_orderpriority, l_quantity
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_urgent_lines
        FROM urgent_lines_v WHERE l_quantity >= 30
        GROUP BY o_orderpriority
        """
    )


@register(
    "hiveql_insert_directory",
    oracle="""
SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1
""",
    category="hiveql",
)
def hiveql_insert_directory(spark, t):
    """``INSERT OVERWRITE DIRECTORY '<path>' ... SELECT`` as SQL text
    (HiveParser.g TOK_DIR inside insertClause; qfile
    ``clientpositive/insert_overwrite_directory.q`` family) — the
    export-to-files form every Hive ETL uses. Spark keeps the exact
    grammar with ``USING parquet``; the written directory is read
    back and must equal the SELECT."""
    from ..scratch import scratch_dir

    t.nation
    d = scratch_dir("hiveql_dir_") + "/out"
    spark.sql(
        f"""
        INSERT OVERWRITE DIRECTORY '{d}' USING parquet
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1
        """
    )
    return spark.read.parquet(d)


@register(
    "hiveql_sessionize_text",
    oracle="""
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
),
flagged AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > INTERVAL 30 MINUTE
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM o
),
sess AS (
  SELECT user_id, t,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                                     ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events,
       CAST(min(t) AS TIMESTAMP) AS session_start
FROM sess GROUP BY user_id, session_no
""",
    category="hiveql",
)
def hiveql_sessionize_text(spark, t):
    """Sessionization as PURE SQL TEXT — the lag + cumulative-flag
    idiom (qfile-era Hive had no session_window; this two-window
    composition was THE way, and it still is the portable one):
    gap > 30 min starts a session, a running SUM of the start flags
    numbers them, then a plain aggregate per session. Text twin of
    the DataFrame ``events_sessionize``; the identical statement is
    the oracle."""
    t.events
    return spark.sql(
        """
        WITH flagged AS (
          SELECT user_id, ts AS t,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts)
                           > INTERVAL 30 MINUTES
                      OR lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sess AS (
          SELECT user_id, t,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                                        ROWS UNBOUNDED PRECEDING)
                   AS session_no
          FROM flagged
        )
        SELECT user_id, session_no, count(*) AS n_events,
               min(t) AS session_start
        FROM sess GROUP BY user_id, session_no
        """
    )


@register(
    "hiveql_named_window",
    oracle="""
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w2 AS DOUBLE)
         AS run_spend
FROM orders
WHERE o_custkey < 100
WINDOW w  AS (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    category="hiveql",
)
def hiveql_named_window(spark, t):
    """Named WINDOW clause as SQL text (HiveParser.g window_clause /
    WindowingSpec.java; qfile ``clientpositive/windowing_windowspec
    .q``): two window specs defined once and referenced by alias from
    different functions — the reference's reusable-windowing-spec
    surface. Running sum goes through DECIMAL(38,6) so the frame
    accumulation is exact on both engines."""
    t.orders
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               rank() OVER w AS rnk,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w2
                    AS DOUBLE) AS run_spend
        FROM orders
        WHERE o_custkey < 100
        WINDOW w  AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey),
               w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "hiveql_macro_expansion",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount))
                     * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_charged,
       CAST(SUM(CAST(CASE WHEN l_discount * 10.0 - 0.2 < 0.0 THEN 0.0
                          WHEN l_discount * 10.0 - 0.2 > 1.0 THEN 1.0
                          ELSE l_discount * 10.0 - 0.2 END
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_clamped,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    category="hiveql",
)
def hiveql_macro_expansion(spark, t):
    """``CREATE TEMPORARY MACRO`` (HIVE-2655;
    ``ql/parse/MacroSemanticAnalyzer.java:45-120``,
    ``ql/udf/generic/GenericUDFMacro.java``; qfile
    ``clientpositive/macro.q``): typed-parameter SQL macros defined per
    session and inlined at call sites — including a macro whose body
    calls an earlier macro (compiled at CREATE time, Hive semantics).
    The executed plan is identical to hand-written SQL: expansion is
    driver-side text, so Catalyst sees one inlined expression — no UDF,
    nothing Python in the row path. Sums go through DECIMAL(38,6) so
    aggregation is order-independent and engine-exact; macro bodies are
    pure IEEE arithmetic (no transcendentals), bit-identical across
    engines."""
    t.lineitem
    from ..functions.macros import MacroRegistry

    m = MacroRegistry()
    m.sql(
        spark,
        "CREATE TEMPORARY MACRO net_price(p DOUBLE, d DOUBLE) "
        "p * (1.0 - d)",
    )
    m.sql(
        spark,
        "CREATE TEMPORARY MACRO charged(p DOUBLE, d DOUBLE, t DOUBLE) "
        "net_price(p, d) * (1.0 + t)",
    )
    m.sql(
        spark,
        "CREATE TEMPORARY MACRO clamp01(x DOUBLE) "
        "CASE WHEN x < 0.0 THEN 0.0 WHEN x > 1.0 THEN 1.0 ELSE x END",
    )
    return m.sql(
        spark,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(charged(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(38,6))) AS DOUBLE) AS sum_charged,
               CAST(SUM(CAST(clamp01(l_discount * 10.0 - 0.2)
                             AS DECIMAL(38,6))) AS DOUBLE) AS sum_clamped,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """,
    )


@register(
    "hiveql_regex_column_spec",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
       upper(o_orderstatus) AS status_uc
FROM orders WHERE o_orderkey < 500
""",
    category="hiveql",
)
def hiveql_regex_column_spec(spark, t):
    """Regex column specification (``hive.support.quoted.identifiers
    =none``, the Hive 1.2 default; ``ql/parse/SemanticAnalyzer.java``
    genColListRegex; qfile ``clientpositive/regex_col.q``): a
    backquoted SELECT-list token is a Java regex over the FROM
    source's columns — here the canonical possessive-quantifier
    EXCLUDE idiom ``(a|b)?+.+`` drops two columns and keeps the rest
    in schema order. Driver-side text expansion
    (functions/colregex.py, same mold as macros): Catalyst sees plain
    column references, so projection pruning reaches the scan exactly
    as if the columns were typed by hand."""
    t.orders
    from ..functions.colregex import sql_with_column_regex

    return sql_with_column_regex(
        spark,
        "SELECT `(o_orderpriority|o_orderstatus)?+.+`, "
        "upper(o_orderstatus) AS status_uc "
        "FROM orders WHERE o_orderkey < 500",
    )


@register(
    "hiveql_variable_substitution",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS total
FROM orders
WHERE o_orderkey >= 100 AND o_orderkey < 3100
  AND o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    category="hiveql",
)
def hiveql_variable_substitution(spark, t):
    """Hive variable substitution (``common/.../VariableSubstitution
    .java``; CliDriver SET processing; qfile
    ``clientpositive/set_processor_namespaces.q``): the
    parameterized-script surface every production Hive job uses —
    ``SET hivevar:k=v`` definitions, ``${hivevar:k}`` and bare
    ``${k}`` references, a NESTED value (${hi} expands to
    ${lo}+3000 and re-expands), and a ``${hiveconf:...}`` reference
    against the session conf. Expansion is driver-side text
    preprocessing (functions/varsub.py): Catalyst parses the final
    statement, so the plan is hand-written-SQL-identical."""
    t.orders
    from ..functions.varsub import VariableContext

    ctx = VariableContext()
    ctx.sql(spark, "SET hivevar:lo=100")
    ctx.sql(spark, "SET hivevar:hi=${lo} + 3000")
    ctx.sql(spark, "SET spark.graft.status=O")
    return ctx.sql(
        spark,
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS total
        FROM orders
        WHERE o_orderkey >= ${hivevar:lo} AND o_orderkey < ${hi}
          AND o_orderstatus = '${hiveconf:spark.graft.status}'
        GROUP BY o_orderpriority
        """,
    )


@register(
    "hiveql_transform_delimited",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name_out,
       CAST(n_regionkey AS BIGINT) AS r
FROM nation
""",
    category="hiveql",
)
def hiveql_transform_delimited(spark, t):
    """``TRANSFORM … ROW FORMAT DELIMITED FIELDS TERMINATED BY``
    on BOTH sides of the script (reference ScriptOperator +
    LazySimpleSerDe custom separators; qfile
    ``clientpositive/transform_ppr1.q`` family): rows reach the
    child process ','-separated instead of tab, and its stdout is
    parsed back with the same delimiter. Proves the configurable
    script-IO SerDe contract, not just the default encoding.
    (Spark applies the output delimiter as a Java regex — String
    .split — so regex metacharacters like '|' would split per
    character; a literal-safe delimiter is the portable choice.)"""
    t.nation
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name, n_regionkey)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
          USING 'cat'
          AS (k bigint, name_out string, r bigint)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
        FROM nation
        """
    )


@register(
    "hiveql_reduce_using",
    oracle="""
SELECT CAST(r AS BIGINT) AS r, CAST(k AS BIGINT) AS k, nm
FROM (
  SELECT n_regionkey AS r, n_nationkey AS k, n_name AS nm
  FROM nation
) ORDER BY r, k
""",
    category="hiveql",
)
def hiveql_reduce_using(spark, t):
    """Hive's ``FROM (… DISTRIBUTE BY … SORT BY …) MAP/REDUCE …
    USING`` keyword forms (HiveParser.g trfmClause — MAP and REDUCE
    are pure synonyms of TRANSFORM, kept for the Hadoop-streaming
    generation; qfile ``clientpositive/reduce_deduplicate.q``
    family): the classic reduce-side script over a clustered,
    sorted stream. The script sees each region's rows contiguously
    in key order — the ReduceSinkOperator contract."""
    t.nation
    return spark.sql(
        """
        FROM (
          SELECT n_regionkey, n_nationkey, n_name
          FROM nation
          DISTRIBUTE BY n_regionkey SORT BY n_regionkey, n_nationkey
        ) clustered
        REDUCE n_regionkey, n_nationkey, n_name
        USING 'cat' AS (r bigint, k bigint, nm string)
        """
    ).orderBy("r", "k")

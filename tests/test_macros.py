"""CREATE TEMPORARY MACRO semantics (HIVE-2655;
ql/parse/MacroSemanticAnalyzer.java, ql/udf/generic/GenericUDFMacro.java).
"""

from __future__ import annotations

import pytest

from hdp2_5_hive_spark.functions.macros import (
    MacroExpansionError,
    MacroRegistry,
)


@pytest.fixture()
def m() -> MacroRegistry:
    return MacroRegistry()


def test_create_use_drop(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO twice(x INT) x + x")
    assert m.sql(spark, "SELECT twice(21) AS v").collect()[0].v == 42
    m.sql(spark, "DROP TEMPORARY MACRO twice")
    # after drop the name is no longer expanded → Spark sees an
    # undefined function
    with pytest.raises(Exception):
        m.sql(spark, "SELECT twice(21) AS v").collect()


def test_declared_type_cast_applied(spark, m):
    # GenericUDFMacro converts arguments to the declared types: an INT
    # parameter truncates a string-typed argument the way CAST does
    m.sql(spark, "CREATE TEMPORARY MACRO asint(x INT) x + 1")
    assert m.sql(spark, "SELECT asint('41') AS v").collect()[0].v == 42


def test_nested_macro_bound_at_create_time(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO inner_m(x INT) x * 10")
    m.sql(spark, "CREATE TEMPORARY MACRO outer_m(x INT) inner_m(x) + 1")
    assert m.sql(spark, "SELECT outer_m(4) AS v").collect()[0].v == 41
    # Hive compiles the body at CREATE time: redefining inner_m must
    # NOT change outer_m
    m.sql(spark, "DROP TEMPORARY MACRO inner_m")
    m.sql(spark, "CREATE TEMPORARY MACRO inner_m(x INT) x * 1000")
    assert m.sql(spark, "SELECT outer_m(4) AS v").collect()[0].v == 41
    # ... but a fresh call of inner_m itself sees the new definition
    assert m.sql(spark, "SELECT inner_m(4) AS v").collect()[0].v == 4000


def test_macro_call_inside_argument(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO inc(x INT) x + 1")
    m.sql(spark, "CREATE TEMPORARY MACRO dbl(x INT) x * 2")
    assert m.sql(spark, "SELECT dbl(inc(20)) AS v").collect()[0].v == 42


def test_args_with_top_level_function_commas(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO pick(a INT, b INT) a - b")
    row = m.sql(
        spark, "SELECT pick(coalesce(NULL, 50), greatest(1, 8)) AS v"
    ).collect()[0]
    assert row.v == 42


def test_string_literal_not_expanded(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO f(x INT) x + 1")
    row = m.sql(spark, "SELECT 'f(1)' AS s, f(1) AS v").collect()[0]
    assert row.s == "f(1)" and row.v == 2


def test_comment_not_expanded(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO f(x INT) x + 1")
    row = m.sql(spark, "SELECT f(1) AS v -- f(999)\n").collect()[0]
    assert row.v == 2


def test_qualified_name_not_expanded(spark, m):
    # db.f(...) is a qualified function reference, never a macro call
    m.sql(spark, "CREATE TEMPORARY MACRO abs(x INT) x + 100")
    # unqualified 'abs' IS shadowed by the macro (Hive registers macros
    # in the session function registry, shadowing builtins)
    assert m.sql(spark, "SELECT abs(-5) AS v").collect()[0].v == 95


def test_case_insensitive_names(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO MyMac(X INT) x * 2")
    assert m.sql(spark, "SELECT mymac(21) AS v").collect()[0].v == 42


def test_zero_arg_macro(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO answer() 42")
    assert m.sql(spark, "SELECT answer() AS v").collect()[0].v == 42


def test_duplicate_parameter_rejected(spark, m):
    with pytest.raises(MacroExpansionError, match="duplicate parameter"):
        m.sql(spark, "CREATE TEMPORARY MACRO bad(x INT, x INT) x + x")


def test_untyped_parameter_rejected(spark, m):
    with pytest.raises(MacroExpansionError, match="must be"):
        m.sql(spark, "CREATE TEMPORARY MACRO bad(x) x + 1")


def test_arity_mismatch_rejected(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO f(x INT) x + 1")
    with pytest.raises(MacroExpansionError, match="expects 1"):
        m.sql(spark, "SELECT f(1, 2)")


def test_drop_missing(spark, m):
    with pytest.raises(MacroExpansionError, match="does not exist"):
        m.sql(spark, "DROP TEMPORARY MACRO nope")
    m.sql(spark, "DROP TEMPORARY MACRO IF EXISTS nope")  # no error


def test_param_not_substituted_into_function_position(spark, m):
    # a formal parameter named like a function must not replace the
    # function CALL of the same name inside the body
    m.sql(spark, "CREATE TEMPORARY MACRO f(upper STRING) upper(upper)")
    assert (
        m.sql(spark, "SELECT f('abc') AS v").collect()[0].v == "ABC"
    )


def test_precedence_preserved_by_parens(spark, m):
    m.sql(spark, "CREATE TEMPORARY MACRO add2(x INT, y INT) x + y")
    # 2 * add2(1+1, 3) → 2 * ((1+1) + 3) = 10, never 2*1+1+3
    assert (
        m.sql(spark, "SELECT 2 * add2(1 + 1, 3) AS v").collect()[0].v == 10
    )


def test_expand_is_plan_only_text(spark, m):
    # the executed plan of the macro form and the hand-inlined form are
    # identical — expansion adds no operator and no UDF
    m.sql(spark, "CREATE TEMPORARY MACRO net(p DOUBLE, d DOUBLE) p * (1.0 - d)")
    expanded = m.expand("SELECT net(2.0, 0.5) AS v")
    assert "net(" not in expanded and "CAST((2.0) AS DOUBLE)" in expanded
    assert m.sql(spark, "SELECT net(2.0, 0.5) AS v").collect()[0].v == 1.0


class TestColumnRegex:
    def test_exclude_idiom_expands_in_schema_order(self, spark, sf_dir):
        from hdp2_5_hive_spark.queries.registry import tables_for

        tables_for(spark, sf_dir)
        from hdp2_5_hive_spark.functions.colregex import (
            expand_column_regex,
        )

        out = expand_column_regex(
            spark,
            "SELECT `(o_orderpriority|o_orderstatus)?+.+` FROM orders",
        )
        assert out.split("FROM")[0].split("SELECT")[1].strip() == (
            "o_orderkey, o_custkey, o_totalprice, o_orderdate"
        )

    def test_positive_pattern_and_passthrough_items(self, spark, sf_dir):
        from hdp2_5_hive_spark.queries.registry import tables_for

        tables_for(spark, sf_dir)
        from hdp2_5_hive_spark.functions.colregex import (
            expand_column_regex,
        )

        out = expand_column_regex(
            spark,
            "SELECT o_custkey, `o_order.+`, 1 AS one FROM orders",
        )
        sel = out.split("FROM")[0]
        assert "o_orderkey, o_orderstatus, o_orderdate, o_orderpriority" in sel
        assert sel.strip().startswith("SELECT o_custkey,")
        assert "1 AS one" in sel

    def test_plain_quoted_identifier_untouched(self, spark, sf_dir):
        from hdp2_5_hive_spark.queries.registry import tables_for

        tables_for(spark, sf_dir)
        from hdp2_5_hive_spark.functions.colregex import (
            expand_column_regex,
        )

        sql = "SELECT `o_custkey` FROM orders"
        assert expand_column_regex(spark, sql) == sql

    def test_no_match_errors_like_hive(self, spark, sf_dir):
        from hdp2_5_hive_spark.queries.registry import tables_for

        tables_for(spark, sf_dir)
        from hdp2_5_hive_spark.functions.colregex import (
            ColumnRegexError,
            expand_column_regex,
        )

        with pytest.raises(ColumnRegexError, match="matched no column"):
            expand_column_regex(spark, "SELECT `zz.+` FROM orders")

    def test_regex_never_matches_inside_string_literal(
        self, spark, sf_dir
    ):
        from hdp2_5_hive_spark.queries.registry import tables_for

        tables_for(spark, sf_dir)
        from hdp2_5_hive_spark.functions.colregex import (
            expand_column_regex,
        )

        sql = ("SELECT o_custkey FROM orders "
               "WHERE o_orderstatus <> 'SELECT `x.+` FROM'")
        assert expand_column_regex(spark, sql) == sql


def test_macro_with_angle_bracket_typed_param(spark):
    """Regression: the param-list splitter was not <>-aware, so
    CREATE TEMPORARY MACRO m(x MAP<STRING,INT>) split inside the type
    and rejected DDL Hive accepts. Call-argument splitting keeps
    treating < > as comparison operators."""
    from hdp2_5_hive_spark.functions.macros import MacroRegistry

    reg = MacroRegistry()
    reg.sql(
        spark,
        "CREATE TEMPORARY MACRO firstval(m MAP<STRING,INT>) m['a']",
    )
    r = reg.sql(
        spark, "SELECT firstval(map('a', 7)) AS v"
    ).collect()
    assert r[0].v == 7
    # comparison operators in ARGUMENTS still split correctly
    reg.sql(spark, "CREATE TEMPORARY MACRO pick(a INT, b INT) a + b")
    r2 = reg.sql(
        spark, "SELECT pick(IF(1 < 2, 10, 0), IF(3 > 2, 5, 0)) AS v"
    ).collect()
    assert r2[0].v == 15


def test_colregex_ignores_subquery_from(spark, sf_dir):
    """Regression: the expander anchored on the FIRST textual FROM,
    so a scalar subquery in the select list resolved the regex
    against the WRONG table (nation instead of orders)."""
    from hdp2_5_hive_spark.catalog import register_views
    from hdp2_5_hive_spark.functions.colregex import expand_column_regex

    register_views(spark, sf_dir)
    out = expand_column_regex(
        spark,
        "SELECT `o_order.*`, (SELECT MAX(n_nationkey) FROM nation) AS x "
        "FROM orders",
    )
    assert "o_orderkey" in out and "o_orderdate" in out
    assert "n_name" not in out  # never expanded against nation
    n = spark.sql(out).limit(1).collect()
    assert n  # the rewritten statement actually runs

"""Interactive SQL shell — the reference's CLI surface
(``cli/.../CliDriver.java:113`` processCmd; ``hive -e/-f`` flags,
``OptionsProcessor.java``) over this engine.

Usage:
    python scripts/sql_shell.py                  # REPL on stdin
    python scripts/sql_shell.py -e "SELECT ..."  # one-shot statement(s)
    python scripts/sql_shell.py -f query.sql     # run a script file
    python scripts/sql_shell.py --sf /root/testdata/sf0.01 ...

``ADD FILE`` / ``LIST FILES`` / ``DELETE FILE`` / ``SOURCE f.sql``
work as in CliDriver (functions/resources.py — ADD distributes via
sparkContext.addFile, the distributed-cache analogue).
``--hivevar k=v`` / ``--define k=v`` seed Hive variables;
``${hivevar:k}`` / ``${k}`` / ``${hiveconf:p}`` / ``${env:N}``
substitute in every statement and ``SET hivevar:k=v`` / ``SET p=v``
work as in the reference CLI (functions/varsub.py).

Statements are split on ';' like the reference CLI. The testdata
tables (region nation customer supplier part orders lineitem events
documents embeddings) are pre-registered as views, so HiveQL-dialect
text (LATERAL VIEW, DISTRIBUTE BY, TRANSFORM, GROUPING SETS,
multi-insert, hints) runs as-is against the same names the driver
and DuckDB oracle use.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_statement(spark, ctx, res, sql: str, max_rows: int) -> None:
    t0 = time.time()
    from hdp2_5_hive_spark.functions import explain_dep

    inner = explain_dep.match(ctx.substitute(spark, sql))
    if inner is not None:
        print(explain_dep.explain_dependency(spark, ctx.sql(spark, inner)))
        print(f"-- ok in {time.time() - t0:.2f}s", file=sys.stderr)
        return
    lines = res.process(
        spark, ctx.substitute(spark, sql),
        run_statement=lambda s: run_statement(spark, ctx, res, s, max_rows),
    )
    if lines is not None:
        for ln in lines:
            print(ln)
        print(f"-- ok in {time.time() - t0:.2f}s", file=sys.stderr)
        return
    df = ctx.sql(spark, sql)
    rows = df.take(max_rows + 1)
    cols = df.columns
    if cols:
        print("\t".join(cols))
        for r in rows[:max_rows]:
            print("\t".join("NULL" if v is None else str(v) for v in r))
    truncated = " (truncated)" if len(rows) > max_rows else ""
    n = min(len(rows), max_rows)
    print(f"-- {n} row(s){truncated} in {time.time() - t0:.2f}s", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-e", metavar="SQL", help="run statement(s) and exit")
    ap.add_argument("-f", metavar="FILE", help="run a SQL script file")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="testdata dir registered as views")
    ap.add_argument("--max-rows", type=int, default=100)
    ap.add_argument("--hivevar", "--define", action="append", default=[],
                    metavar="K=V", help="define a Hive variable")
    args = ap.parse_args()

    from hdp2_5_hive_spark.catalog import register_views
    from hdp2_5_hive_spark.functions.varsub import VariableContext
    from hdp2_5_hive_spark.session import get_session

    spark = get_session(app_name="sql-shell")
    register_views(spark, args.sf)
    ctx = VariableContext(
        dict(kv.split("=", 1) for kv in args.hivevar)
    )
    from hdp2_5_hive_spark.functions.resources import ResourceManager

    res = ResourceManager()

    if args.e is not None:
        text = args.e
    elif args.f is not None:
        text = Path(args.f).read_text()
    else:
        print(f"engine shell — tables from {args.sf}; ';' ends a "
              "statement, ctrl-D exits", file=sys.stderr)
        text = sys.stdin.read()

    from hdp2_5_hive_spark.functions.resources import split_statements

    rc = 0
    # quote-aware split (CliDriver semantics): a bare split(';') broke
    # any statement with a semicolon inside a string literal
    for stmt in split_statements(text):
        try:
            run_statement(spark, ctx, res, stmt, args.max_rows)
        except Exception as e:  # keep going like the CLI does
            print(f"ERROR: {type(e).__name__}: {str(e)[:400]}", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())

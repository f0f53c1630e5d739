"""HiveServer2 wire-protocol endpoint launcher — entry point B.

Serves the TCLIService Thrift protocol over the engine with the
testdata tables registered as views. Transport is auto-detected per
connection: SASL/PLAIN (stock ``jdbc:hive2://host:port/default``)
and NOSASL (``;auth=noSasl``) both work on the same port. The wire
codec is sources/hs2_wire.py, built from the reference's own IDL
(``service/if/TCLIService.thrift``).

Usage:
    python scripts/hs2_server.py [--port 10000] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=10000)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--max-rows", type=int, default=1000)
    ap.add_argument(
        "--result-cap", type=int, default=100_000,
        help="max rows materialized per statement (take(cap+1); "
        "truncation is signaled in-band: SUCCESS_WITH_INFO TStatus "
        "with an infoMessage on every fetch, plus hasMoreRows on the "
        "final non-empty batch)",
    )
    ap.add_argument(
        "--strict-truncation", action="store_true",
        help="fetches of a result truncated at --result-cap return an "
        "ERROR TStatus instead of partial data + SUCCESS_WITH_INFO — "
        "for clients that must never act on a partial result set",
    )
    args = ap.parse_args()

    from hdp2_5_hive_spark.catalog import register_views
    from hdp2_5_hive_spark.session import get_session
    from hdp2_5_hive_spark.sources.hs2_wire import serve_background

    spark = get_session(app_name="hs2-wire")
    register_views(spark, args.sf)
    srv, port = serve_background(
        spark, port=args.port, max_rows=args.max_rows,
        result_cap=args.result_cap,
        strict_truncation=args.strict_truncation,
    )
    print(
        f"TCLIService (SASL/PLAIN + NOSASL) listening on port {port}",
        file=sys.stderr,
    )
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

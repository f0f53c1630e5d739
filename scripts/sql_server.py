"""Minimal SQL-over-socket server — the HiveServer2 entry-point
analogue (SURVEY §3 entry point B: `jdbc/HiveStatement.execute` →
Thrift RPC → `SQLOperation.runQuery` → Driver.run; here: JSON-lines
RPC → spark.sql → row fetch), sized for the facade role the Spark
mapping assigns it (Catalyst replaces the Driver pipeline; the
server's job is the process boundary + statement isolation).

The idiomatic production surface for this entry point is Spark
Connect / the Spark Thrift server; this container cannot run either
(Connect needs google.protobuf, broken here — the same env gap that
skips transformWithStateInPandas). This module keeps the RPC shape
testable: one JSON object per line in ({"sql": ...}) and out
({"columns": [...], "rows": [...]} or {"error": ...}), N concurrent
clients served by threads over ONE SparkSession (Spark sessions are
thread-safe for concurrent actions, exactly how HiveServer2
multiplexes operations onto shared infra).

Usage:
    python scripts/sql_server.py [--port 0] [--sf DIR]   # serves forever
    from scripts.sql_server import serve_background       # tests
"""

from __future__ import annotations

import argparse
import json
import socket
import socketserver
import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MAX_ROWS = 1000
# Longest request line accepted (fuzz contract, verdict r12 #2): the
# line reader otherwise buffers an unterminated line without bound —
# a client streaming gigabytes with no newline is a driver-memory
# attack, not a query.
MAX_LINE_BYTES = 4 << 20  # 4 MiB of SQL is a generous statement


def _execute(spark, sql: str) -> dict:
    try:
        # Hive-parity confs on whatever session serves the socket —
        # same choke-point rule as registry.tables_for (a vanilla
        # session would otherwise run ANSI-on, breaking
        # NULL-on-error casts and arithmetic for clients)
        from hdp2_5_hive_spark.catalog import ensure_parity_confs

        ensure_parity_confs(spark)
        df = spark.sql(sql)
        # take one extra row so clipping is DETECTABLE: a silent cap
        # at exactly MAX_ROWS is indistinguishable from a complete
        # MAX_ROWS result (ADVICE r6) — clients get "truncated": true
        rows = df.take(MAX_ROWS + 1)
        truncated = len(rows) > MAX_ROWS
        return {
            "columns": df.columns,
            "rows": [
                [None if v is None else str(v) for v in r]
                for r in rows[:MAX_ROWS]
            ],
            "truncated": truncated,
        }
    except Exception as exc:  # noqa: BLE001 — errors go to the client
        return {"error": f"{type(exc).__name__}: {exc}"}


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        while True:
            line = self.rfile.readline(MAX_LINE_BYTES + 1)
            if not line:
                return  # clean close
            if len(line) > MAX_LINE_BYTES and not line.endswith(b"\n"):
                # over-long unterminated line: answer once and DROP
                # the connection — everything after this point is the
                # middle of the same oversized line, not a request
                self._reply(
                    {
                        "error": f"request line exceeds "
                        f"{MAX_LINE_BYTES} bytes"
                    }
                )
                return
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
                sql = req["sql"]
                if not isinstance(sql, str):
                    raise TypeError("'sql' must be a string")
                out = _execute(self.server.spark, sql)
            except Exception as exc:  # noqa: BLE001
                out = {"error": f"bad request: {exc}"}
            if not self._reply(out):
                return

    def _reply(self, out: dict) -> bool:
        """Write one JSON line; False when the peer is gone (a broken
        pipe must close this handler quietly, not traceback the
        serving thread)."""
        try:
            self.wfile.write((json.dumps(out) + "\n").encode())
            self.wfile.flush()
            return True
        except (OSError, ValueError):
            return False


class SqlServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, spark, port: int = 0):
        super().__init__(("127.0.0.1", port), _Handler)
        self.spark = spark


def serve_background(spark, port: int = 0) -> tuple[SqlServer, int]:
    """Start serving on a daemon thread; returns (server, bound port)."""
    srv = SqlServer(spark, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def query(port: int, sql: str) -> dict:
    """One-shot client: send a statement, read one JSON reply."""
    with socket.create_connection(("127.0.0.1", port)) as s:
        s.sendall((json.dumps({"sql": sql}) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from hdp2_5_hive_spark.catalog import register_views
    from hdp2_5_hive_spark.session import get_session

    spark = get_session(app_name="sql-server")
    register_views(spark, args.sf)
    srv = SqlServer(spark, args.port)
    print(f"listening on {srv.server_address[1]}", flush=True)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""TCLIService wire protocol (sources/hs2_wire): known-byte pins
against the public thrift strict binary protocol, and an E2E
loopback — open session → execute SQL → metadata → fetch → close —
over a real TCP socket with the library-free client."""

from __future__ import annotations

import struct

import pytest

from hdp2_5_hive_spark.sources import hs2_wire as hw
from hdp2_5_hive_spark.sources import thrift_py as tp


def test_strict_message_header_bytes():
    """Strict binary protocol: i32 0x80010000|type, i32-length name,
    i32 seqid (public thrift spec) — pinned byte-for-byte."""
    msg = (
        struct.pack(">I", hw.VERSION_MASK | hw.CALL)
        + hw._string("OpenSession")
        + struct.pack(">i", 7)
    )
    assert msg[:4] == b"\x80\x01\x00\x01"
    assert msg[4:8] == struct.pack(">i", 11)
    assert msg[8:19] == b"OpenSession"
    assert msg[19:23] == struct.pack(">i", 7)


def test_status_struct_bytes():
    """TStatus{1: i32 SUCCESS} encodes as field header (type 8 =
    I32, id 1), 4-byte value, T_STOP."""
    assert hw._status(hw.SUCCESS) == b"\x08\x00\x01\x00\x00\x00\x00\x00"
    err = hw._status(hw.ERROR, "boom")
    # field 1 = 3 (ERROR), field 3 = sqlState, field 5 = message
    decoded = tp.decode_row(err, 5)
    assert decoded[0] == hw.ERROR
    assert decoded[2] == "42000"
    assert decoded[4] == "boom"


@pytest.fixture(scope="module")
def hs2(spark, sf_dir):
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    yield port
    srv.shutdown()


def test_e2e_open_execute_fetch_close(hs2):
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    assert cli.session is not None
    op = cli.execute(
        "SELECT n_nationkey, n_name, CAST(n_regionkey AS DOUBLE) AS r "
        "FROM nation ORDER BY n_nationkey LIMIT 3"
    )
    schema = cli.schema(op)
    assert [c[0] for c in schema] == ["n_nationkey", "n_name", "r"]
    # integer key may register as int or bigint depending on the
    # catalog's view cast — both are correct TTypeIds
    assert schema[0][1] in (hw.TYPE_ID["int"], hw.TYPE_ID["bigint"])
    assert schema[1][1] == hw.TYPE_ID["string"]
    assert schema[2][1] == hw.TYPE_ID["double"]
    rows, _ = cli.fetch(op)
    assert rows[0] == (0, "NATION_0", 0.0)
    assert len(rows) == 3
    cli.close()


def test_e2e_pagination_and_has_more(hs2):
    """maxRows=10 server: a 25-row result pages as 10/10/5 with
    hasMoreRows true/true/false."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    op = cli.execute("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    got, pages = [], 0
    more = True
    while more:
        rows, more = cli.fetch(op)
        got.extend(r[0] for r in rows)
        pages += 1
        assert pages < 10
    assert got == list(range(25))
    assert pages == 3
    cli.close()


def test_e2e_nosasl_transport_still_served(hs2):
    """The raw unframed transport (jdbc ;auth=noSasl) coexists with
    SASL on the same port — the server picks the path from the first
    byte (0x80 strict version word vs 0x01 SASL START), mirroring
    HiveAuthFactory's transport selection."""
    cli = hw.HS2WireClient("127.0.0.1", hs2, sasl=False)
    cli.open_session()
    op = cli.execute("SELECT 41 + 1 AS answer")
    rows, _ = cli.fetch(op)
    assert rows == [(42,)]
    cli.close()


def test_sasl_plain_handshake_wire_bytes(hs2):
    """Pin the TSaslTransport negotiation bytes: START('PLAIN'),
    COMPLETE(authzid NUL authcid NUL passwd) -> server COMPLETE(empty),
    then 4-byte length-framed data (PLAIN = auth-only QOP, unwrapped).
    Reference: PlainSaslHelper.java + RFC 4616."""
    import socket as socklib

    s = socklib.create_connection(("127.0.0.1", hs2))
    rf = s.makefile("rb")
    s.sendall(struct.pack(">bi", 1, 5) + b"PLAIN")          # START
    init = b"\x00alice\x00secret"
    s.sendall(struct.pack(">bi", 5, len(init)) + init)       # COMPLETE
    status, ln = struct.unpack(">bi", rf.read(5))
    assert (status, ln) == (5, 0)                            # COMPLETE, empty
    # data phase: one framed OpenSession call -> one framed reply
    body = (
        struct.pack(">I", hw.VERSION_MASK | hw.CALL)
        + hw._string("OpenSession")
        + struct.pack(">i", 1)
        + hw._fld(1, tp.T_STRUCT, hw._stop())
        + hw._stop()
    )
    s.sendall(struct.pack(">i", len(body)) + body)
    (flen,) = struct.unpack(">i", rf.read(4))
    frame = rf.read(flen)
    assert frame[:4] == struct.pack(">I", hw.VERSION_MASK | hw.REPLY)
    s.close()


def test_sasl_rejects_bad_mechanism_and_empty_user(hs2):
    import socket as socklib

    # unknown mechanism -> BAD (3)
    s = socklib.create_connection(("127.0.0.1", hs2))
    s.sendall(struct.pack(">bi", 1, 6) + b"GSSAPI")
    status, ln = struct.unpack(">bi", s.makefile("rb").read(5))
    assert status == 3
    s.close()
    # empty authcid -> ERROR (4), like PlainSaslHelper's null-user check
    s = socklib.create_connection(("127.0.0.1", hs2))
    s.sendall(struct.pack(">bi", 1, 5) + b"PLAIN")
    s.sendall(struct.pack(">bi", 5, 2) + b"\x00\x00")
    status, ln = struct.unpack(">bi", s.makefile("rb").read(5))
    assert status == 4
    s.close()


def test_e2e_result_cap_bounds_driver_materialization(spark, sf_dir):
    """ExecuteStatement materializes AT MOST result_cap rows on the
    driver (take(cap+1), a pushed GlobalLimit — never an unbounded
    collect). A 25-row result on a cap-7 server yields exactly 7 rows;
    the final non-empty fetch signals hasMoreRows=true (rows were
    dropped) and a follow-up empty fetch reports false so pollers
    terminate. Pins the fix for the declared-but-unapplied result_cap
    (SQLOperation streams from FetchTask and never buffers the full
    result either — service/.../operation/SQLOperation.java:76)."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10, result_cap=7)
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute(
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey"
        )
        # server-side buffer is capped at exactly result_cap rows
        buffered = next(iter(srv.ops.values()))
        assert len(buffered[1]) == 7 and buffered[3] is True
        rows1, more1 = cli.fetch(op)          # 7 rows (< max_rows=10)
        assert [r[0] for r in rows1] == list(range(7))
        assert more1 is True                   # truncation signal
        # in-band signal (ADVICE r8): the truncated op's fetch status
        # is SUCCESS_WITH_INFO with an infoMessage naming the cap
        code, info = cli.last_fetch_status
        assert code == hw.SUCCESS_WITH_INFO
        assert info and "result_cap=7" in info[0]
        rows2, more2 = cli.fetch(op)           # drained
        assert rows2 == [] and more2 is False
        # ...and the post-drain EMPTY fetch (what loop-until-empty
        # clients terminate on) still says SUCCESS_WITH_INFO, so no
        # stock client can mistake a capped result for complete
        code2, info2 = cli.last_fetch_status
        assert code2 == hw.SUCCESS_WITH_INFO and info2
        # an uncapped statement on the same server is unaffected
        op2 = cli.execute(
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5"
        )
        rows3, more3 = cli.fetch(op2)
        assert len(rows3) == 5 and more3 is False
        assert cli.last_fetch_status[0] == hw.SUCCESS
        cli.close()
    finally:
        srv.shutdown()


def test_e2e_null_values_absent_fields(hs2):
    """NULLs travel as wrapper structs with the optional value field
    ABSENT (TColumnValue note), not as sentinel values."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    op = cli.execute(
        "SELECT CASE WHEN n_nationkey % 2 = 0 THEN NULL "
        "ELSE n_nationkey END AS k FROM nation ORDER BY n_nationkey LIMIT 4"
    )
    rows, _ = cli.fetch(op)
    assert [r[0] for r in rows] == [None, 1, None, 3]
    cli.close()


def test_e2e_sql_error_is_tstatus_error(hs2):
    """A failing statement comes back as TStatus ERROR with the
    message — the connection survives (SQLOperation parity)."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    with pytest.raises(RuntimeError, match="SQL error"):
        cli.execute("SELECT bogus FROM nowhere_at_all")
    # connection still usable
    op = cli.execute("SELECT 1 AS one")
    rows, _ = cli.fetch(op)
    assert rows == [(1,)]
    cli.close()


def test_unknown_method_is_application_exception(hs2):
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    with pytest.raises(RuntimeError, match="server exception"):
        cli._call("RenewDelegationToken", hw._stop())
    cli.sock.close()


def test_jdbc_catalog_methods(hs2):
    """GetSchemas/GetTables/GetTableTypes — the metadata calls JDBC
    tooling issues right after connect — serve ODBC-standard result
    sets through the same fetch machinery."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()

    op = cli._call(
        "GetSchemas",
        hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session)) + hw._stop(),
    )[1][0][0]
    if isinstance(op, str):
        op = op.encode("latin-1")
    rows, _ = cli.fetch(op)
    assert rows == [("default", None)]

    # create a marker view THROUGH THE WIRE so the listing assertion
    # is self-contained (other suite tests may re-point or drop the
    # shared session's views)
    cli.execute("CREATE OR REPLACE TEMPORARY VIEW hs2_marker AS SELECT 1 AS x")
    op = cli._call(
        "GetTables",
        hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session)) + hw._stop(),
    )[1][0][0]
    if isinstance(op, str):
        op = op.encode("latin-1")
    schema = cli.schema(op)
    assert [c[0] for c in schema][:3] == [
        "TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME",
    ]
    names, more = set(), True
    while more:
        rows, more = cli.fetch(op, max_rows=1000)
        names |= {r[2] for r in rows}
    assert "hs2_marker" in names
    cli.close()


def test_operation_status_finished(hs2):
    """GetOperationStatus: sync execution means a live handle is
    FINISHED_STATE (2) — the one poll an async JDBC client needs."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    op = cli.execute("SELECT 1 AS one")
    resp = cli._call(
        "GetOperationStatus",
        hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop(),
    )
    assert resp[1] == 2  # FINISHED_STATE
    cli.close()


def test_columnar_rowset_protocol_v6(spark, sf_dir):
    """Protocol V6+ serves COLUMN-based TRowSets (list<TColumn> with
    null bitmasks, empty required rows field — Hive's columnar
    layout): values, NULLs, and pagination all survive."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(
        spark, max_rows=10, protocol=hw.PROTOCOL_V6
    )
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute(
            "SELECT n_nationkey, CASE WHEN n_nationkey % 2 = 0 THEN NULL "
            "ELSE n_name END AS nm FROM nation ORDER BY n_nationkey"
        )
        got, more = [], True
        while more:
            rows, more = cli.fetch(op)
            got.extend(rows)
        assert len(got) == 25
        assert got[0] == (0, None) and got[1][1] == "NATION_1"
        cli.close()
    finally:
        srv.shutdown()


def test_get_columns_for_table(hs2):
    """GetColumns with a table pattern returns the ODBC column rows
    (name, type, ordinal) for that table."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    cli.execute(
        "CREATE OR REPLACE TEMPORARY VIEW hs2_cols AS "
        "SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c"
    )
    req = (
        hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session))
        + hw._fld(4, tp.T_STRING, hw._string("hs2_cols"))
        + hw._stop()
    )
    op = cli._call("GetColumns", req)[1][0][0]
    if isinstance(op, str):
        op = op.encode("latin-1")
    rows, more = [], True
    while more:
        batch, more = cli.fetch(op)
        rows.extend(batch)
    cols = [(r[3], r[4], r[5]) for r in rows]
    assert cols == [("a", "int", 1), ("b", "string", 2), ("c", "double", 3)]
    cli.close()


def test_concurrent_wire_clients(hs2):
    """Two clients with interleaved operations on one server: the
    threading server keeps sessions/operations isolated."""
    from concurrent.futures import ThreadPoolExecutor

    def run(tag: int):
        cli = hw.HS2WireClient("127.0.0.1", hs2)
        cli.open_session()
        op = cli.execute(f"SELECT {tag} AS t, count(*) AS n FROM nation")
        rows, _ = cli.fetch(op)
        cli.close()
        return rows

    with ThreadPoolExecutor(2) as ex:
        a = ex.submit(run, 1)
        b = ex.submit(run, 2)
        ra, rb = a.result(120), b.result(120)
    assert ra == [(1, 25)] and rb == [(2, 25)]


def test_get_functions_and_type_info(hs2):
    """GetFunctions (registry-backed, pattern filter) + GetTypeInfo
    (static ODBC type table) — the remaining ODBC metadata entry
    points a driver calls at connect."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()

    req = (
        hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session))
        + hw._fld(4, tp.T_STRING, hw._string("concat_ws"))
        + hw._stop()
    )
    op = cli._call("GetFunctions", req)[1][0][0]
    if isinstance(op, str):
        op = op.encode("latin-1")
    rows, _ = cli.fetch(op)
    assert [r[2] for r in rows] == ["concat_ws"]
    assert rows[0][5] == "concat_ws"  # SPECIFIC_NAME mirrors

    op = cli._call(
        "GetTypeInfo",
        hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session)) + hw._stop(),
    )[1][0][0]
    if isinstance(op, str):
        op = op.encode("latin-1")
    schema = cli.schema(op)
    assert [c[0] for c in schema][:2] == ["TYPE_NAME", "DATA_TYPE"]
    all_rows, more = [], True
    while more:
        rows, more = cli.fetch(op, max_rows=100)
        all_rows += rows
    by_name = {r[0]: r[1] for r in all_rows}
    assert by_name["BIGINT"] == -5 and by_name["TIMESTAMP"] == 93
    cli.close()


def test_launcher_result_cap_flag(sf_dir):
    """Launcher-level coverage for ``--result-cap`` (verdict r8 #7):
    the flag must reach the server — a cap-5 launcher truncates a
    25-row statement at 5 rows and signals it in-band
    (SUCCESS_WITH_INFO + infoMessage + hasMoreRows)."""
    import re
    import subprocess
    import sys as _sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    proc = subprocess.Popen(
        [
            _sys.executable,
            str(root / "scripts" / "hs2_server.py"),
            "--port", "0", "--sf", sf_dir, "--result-cap", "5",
        ],
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # the launcher prints the bound port on stderr once Spark is
        # up; scan by TIME (verbose JVM/Ivy logging can emit any
        # number of lines first), then hand the pipe to a drainer
        # thread so the child can never block on a full stderr buffer
        import threading
        import time

        port = None
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stderr.readline()
            if not line:
                if proc.poll() is not None:
                    break  # launcher died
                continue
            m = re.search(r"listening on port (\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, "launcher never reported a bound port"
        threading.Thread(
            target=proc.stderr.read, daemon=True
        ).start()  # keep draining so the server can't block on stderr
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute(
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey"
        )
        rows, more = cli.fetch(op)
        assert len(rows) == 5 and more is True
        code, info = cli.last_fetch_status
        assert code == hw.SUCCESS_WITH_INFO
        assert info and "result_cap=5" in info[0]
        cli.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_close_session_frees_operation_buffers(spark, sf_dir):
    """CloseSession must release every op buffer the session left
    open (HiveSessionImpl.close parity) — a long-lived server serving
    close-session-only clients (most JDBC pools) otherwise
    accumulates up-to-result_cap-row buffers forever."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        for _ in range(3):
            cli.execute("SELECT n_nationkey FROM nation LIMIT 5")
        assert len(srv.ops) == 3
        cli.close()  # CloseSession only — no CloseOperation calls
        assert srv.ops == {} and srv.session_ops == {}
        # explicit CloseOperation still works and is also freed
        cli2 = hw.HS2WireClient("127.0.0.1", port)
        cli2.open_session()
        op = cli2.execute("SELECT 1 AS one")
        req = hw._fld(1, tp.T_STRUCT, cli2._op_struct(op)) + hw._stop()
        cli2._call("CloseOperation", req)
        assert srv.ops == {}
        cli2.close()
    finally:
        srv.shutdown()


def test_unknown_operation_handle_is_error_tstatus(spark, sf_dir):
    """A handle freed by CloseOperation/CloseSession (or never
    issued) fails with an ERROR TStatus on GetOperationStatus,
    FetchResults AND GetResultSetMetadata — real HS2 raises "Invalid
    OperationHandle" (OperationManager.getOperation); a CLOSED state
    or empty result would let a poller mistake a freed op for a
    legitimately finished one (verdict r9 #6)."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute("SELECT 1 AS one")
        # free it via CloseOperation, then poll/fetch the dead handle
        req = hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop()
        cli._call("CloseOperation", req)
        resp = cli._call(
            "GetOperationStatus",
            hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop(),
        )
        assert resp[0][0] == hw.ERROR
        assert "Invalid OperationHandle" in resp[0][4]
        with pytest.raises(RuntimeError, match="Invalid OperationHandle"):
            cli.fetch(op)
        meta = cli._call(
            "GetResultSetMetadata",
            hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop(),
        )
        assert meta[0][0] == hw.ERROR
        # a never-issued guid errors the same way
        bogus = b"deadbeefdeadbeef"
        resp = cli._call(
            "GetOperationStatus",
            hw._fld(1, tp.T_STRUCT, cli._op_struct(bogus)) + hw._stop(),
        )
        assert resp[0][0] == hw.ERROR
        cli.close()
    finally:
        srv.shutdown()


def test_close_operation_shrinks_session_op_set(spark, sf_dir):
    """ADVICE r9: CloseOperation must also remove the guid from the
    owning session's set — a long-lived session that properly closes
    each operation must not grow its op list without bound until
    CloseSession."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        ops = [cli.execute(f"SELECT {i} AS v") for i in range(3)]
        (sguid,) = srv.session_ops
        assert len(srv.session_ops[sguid]) == 3
        for op in ops:
            req = hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop()
            cli._call("CloseOperation", req)
        # all buffers freed AND the session's set drained (the empty
        # set itself is dropped), before any CloseSession
        assert srv.ops == {} and srv.op_session == {}
        assert srv.session_ops == {}
        cli.close()
    finally:
        srv.shutdown()


def test_metadata_operations_freed_by_close_session(spark, sf_dir):
    """ADVICE r9: GetTables/GetSchemas/GetTypeInfo/GetFunctions
    buffers are registered under the requesting session, so a
    close-session-only JDBC client that browses catalog metadata
    does not leak op buffers."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        sreq = hw._fld(1, tp.T_STRUCT, cli._handle_struct(cli.session))
        for method in ("GetSchemas", "GetTables", "GetTypeInfo"):
            cli._call(method, sreq + hw._stop())
        assert len(srv.ops) == 3
        cli.close()  # CloseSession only — never CloseOperation
        assert srv.ops == {} and srv.session_ops == {}
        assert srv.op_session == {}
    finally:
        srv.shutdown()


def test_strict_truncation_fetch_is_hard_error(spark, sf_dir):
    """--strict-truncation: a fetch of a result the server truncated
    at result_cap returns an ERROR TStatus (no partial data) instead
    of data + SUCCESS_WITH_INFO; un-truncated results are served
    normally on the same server."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(
        spark, max_rows=10, result_cap=5, strict_truncation=True
    )
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute("SELECT n_nationkey FROM nation")  # 25 > cap
        with pytest.raises(RuntimeError, match="strict-truncation"):
            cli.fetch(op)
        # a result within the cap still flows, plain SUCCESS
        op2 = cli.execute(
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3"
        )
        rows, _ = cli.fetch(op2)
        assert [r[0] for r in rows] == [0, 1, 2]
        assert cli.last_fetch_status[0] == hw.SUCCESS
        cli.close()
    finally:
        srv.shutdown()


def test_concurrent_execute_close_session_never_leaks(spark, sf_dir):
    """ADVICE r9 race: ExecuteStatement publishing an op concurrently
    with CloseSession must never leave an orphaned buffer — the ops
    entry and its session_ops membership are published atomically
    under the server lock (register_op), so whichever side wins the
    lock, every registered op is freed by the drain or by the test's
    final CloseSession. Hammers the interleaving from two threads."""
    import threading

    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        for _ in range(5):
            cli = hw.HS2WireClient("127.0.0.1", port)
            cli.open_session()
            # a second connection sharing the SAME session handle
            closer = hw.HS2WireClient("127.0.0.1", port)
            closer.session = cli.session
            errs: list[Exception] = []

            def run_stmts():
                try:
                    for i in range(4):
                        cli.execute(f"SELECT {i} AS v")
                except Exception as exc:  # session may close mid-run
                    errs.append(exc)

            t = threading.Thread(target=run_stmts)
            t.start()
            closer.close()  # CloseSession racing the executes
            t.join()
            # r10 verdict: a lock alone only fixed ONE interleaving —
            # an execute finishing AFTER close_session_ops used to
            # re-register under the dead session and leak until a
            # client happened to close that session again. With the
            # live-session registry, register_op refuses the dead
            # session (the client sees Invalid SessionHandle), so the
            # drain alone must leave NOTHING behind — no final
            # CloseSession needed.
            assert srv.ops == {}, srv.ops
            final = hw.HS2WireClient("127.0.0.1", port)
            final.session = cli.session
            final.close()
            assert srv.ops == {}, srv.ops
            assert srv.op_session == {}
            assert srv.session_ops == {}
            cli.sock.close()
    finally:
        srv.shutdown()


def test_execute_on_unopened_session_is_invalid_session(hs2):
    """ExecuteStatement under a session guid that was never opened
    (or already closed) answers Invalid SessionHandle instead of
    silently parking an unfreeable result buffer under it."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.session = b"deadbeefdeadbeef"  # never OpenSession'd
    with pytest.raises(RuntimeError, match="Invalid SessionHandle"):
        cli.execute("SELECT 1 AS v")
    cli.sock.close()


def test_schema_on_closed_operation_is_error_tstatus(hs2):
    """GetResultSetMetadata on a freed handle surfaces the server's
    Invalid-OperationHandle message — regression: the client indexed
    into the status-only reply and died with a bare IndexError."""
    cli = hw.HS2WireClient("127.0.0.1", hs2)
    cli.open_session()
    op = cli.execute("SELECT 1 AS v")
    assert cli.schema(op)  # live handle works
    req = hw._fld(1, tp.T_STRUCT, cli._op_struct(op)) + hw._stop()
    cli._call("CloseOperation", req)
    with pytest.raises(RuntimeError, match="Invalid OperationHandle"):
        cli.schema(op)
    cli.close()


def test_fetch_error_updates_last_fetch_status(spark, sf_dir):
    """A refused fetch (strict truncation) must overwrite
    last_fetch_status before raising — a caller that catches the
    error and inspects the documented truncation-detection channel
    must not read the PREVIOUS fetch's stale SUCCESS tuple."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(
        spark, max_rows=10, result_cap=5, strict_truncation=True
    )
    try:
        cli = hw.HS2WireClient("127.0.0.1", port)
        cli.open_session()
        ok = cli.execute("SELECT 1 AS v")
        cli.fetch(ok)
        assert cli.last_fetch_status[0] == 0  # SUCCESS
        trunc = cli.execute("SELECT n_nationkey FROM nation")
        with pytest.raises(RuntimeError, match="strict-truncation"):
            cli.fetch(trunc)
        assert cli.last_fetch_status[0] == 3  # ERROR, not stale SUCCESS
        cli.close()
    finally:
        srv.shutdown()

"""Mutation-fuzz contract for the NETWORK-FACING decoders (verdict
r12 #2): the HS2 Thrift wire server parses attacker-controllable
bytes off a socket, where a hang or an internal-error leak is
strictly worse than in a file reader. Same contract as the r12 file
decoder campaign: parse or raise a PROTOCOL error (ValueError /
EOFError), never hang, never leak struct.error / IndexError /
UnicodeDecodeError¹ / RecursionError; the server loop survives and
the session registry stays consistent.

¹ UnicodeDecodeError is a ValueError subclass, but the reader still
converts method-name decode failures explicitly so the message names
the protocol violation rather than an internal codec offset.
"""

from __future__ import annotations

import io
import random
import socket
import struct
import time

import pytest

from hdp2_5_hive_spark.sources import hs2_wire as hw
from hdp2_5_hive_spark.sources import thrift_py as tp

ALLOWED = (ValueError, EOFError)
# struct.error / IndexError / KeyError / RecursionError / MemoryError
# must never escape the wire readers — assert by exclusion: anything
# not in ALLOWED fails the test.

INTERESTING_I32 = [
    0,
    1,
    -1,
    -2,
    127,
    255,
    0x7FFFFFFF,
    -0x80000000,
    hw.MAX_WIRE_STRING + 1,
    hw.MAX_CONTAINER_ITEMS + 1,
    1 << 30,
]


def _valid_call_bytes(name: str, req_struct: bytes, seqid: int = 1) -> bytes:
    return (
        struct.pack(">I", hw.VERSION_MASK | hw.CALL)
        + hw._string(name)
        + struct.pack(">i", seqid)
        + hw._fld(1, tp.T_STRUCT, req_struct)
        + hw._stop()
    )


def _seed_messages() -> list[bytes]:
    open_req = (
        hw._fld(1, tp.T_I32, hw._i32(hw.PROTOCOL_V5))
        + hw._fld(2, tp.T_STRING, hw._string("anonymous"))
        + hw._stop()
    )
    handle = (
        hw._fld(
            1,
            tp.T_STRUCT,
            hw._fld(1, tp.T_STRING, hw._binary(b"0123456789abcdef"))
            + hw._fld(2, tp.T_STRING, hw._binary(b"\x00" * 16))
            + hw._stop(),
        )
        + hw._stop()
    )
    exec_req = (
        hw._fld(1, tp.T_STRUCT, handle)
        + hw._fld(2, tp.T_STRING, hw._string("SELECT 1 AS one"))
        + hw._fld(
            3,
            tp.T_MAP,
            struct.pack(">bbi", tp.T_STRING, tp.T_STRING, 1)
            + hw._string("k")
            + hw._string("v"),
        )
        + hw._stop()
    )
    return [
        _valid_call_bytes("OpenSession", open_req),
        _valid_call_bytes("ExecuteStatement", exec_req),
        _valid_call_bytes("CloseSession", handle),
    ]


def _mutations(seed_payloads: list[bytes], rng: random.Random, n: int):
    """Yield n seeded mutations: truncations, byte flips, interesting
    i32 overwrites, slice duplication, random insertions."""
    for _ in range(n):
        base = bytearray(rng.choice(seed_payloads))
        kind = rng.randrange(5)
        if kind == 0 and len(base) > 1:  # truncate
            base = base[: rng.randrange(1, len(base))]
        elif kind == 1:  # flip 1-4 bytes
            for _ in range(rng.randrange(1, 5)):
                i = rng.randrange(len(base))
                base[i] ^= 1 << rng.randrange(8)
        elif kind == 2 and len(base) >= 4:  # interesting i32 overwrite
            i = rng.randrange(len(base) - 3)
            base[i : i + 4] = struct.pack(
                ">i",
                rng.choice(INTERESTING_I32)
                if rng.random() < 0.9
                else rng.randrange(-(1 << 31), 1 << 31),
            )
        elif kind == 3 and len(base) > 8:  # duplicate a slice
            a = rng.randrange(len(base) - 4)
            b = min(len(base), a + rng.randrange(1, 64))
            base[a:a] = base[a:b]
        else:  # insert random bytes
            i = rng.randrange(len(base) + 1)
            base[i:i] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 16))
            )
        yield bytes(base)


def test_read_message_fuzz_only_protocol_errors():
    """600 seeded mutations of valid CALL messages through
    _read_message: every outcome is a parsed message, ValueError, or
    EOFError — never struct.error/IndexError/UnicodeDecodeError
    leaks, never a pathological stall."""
    rng = random.Random(0xC0FFEE)
    seeds = _seed_messages()
    t0 = time.time()
    outcomes = {"ok": 0, "ValueError": 0, "EOFError": 0}
    for payload in _mutations(seeds, rng, 600):
        try:
            hw._read_message(io.BytesIO(payload))
            outcomes["ok"] += 1
        except ALLOWED as exc:
            outcomes[type(exc).__name__.replace(
                "UnicodeDecodeError", "ValueError"
            )] = outcomes.get(type(exc).__name__, 0) + 1
    # the campaign must finish promptly — a count-loop or read(-1)
    # stall shows up as minutes, not seconds
    assert time.time() - t0 < 30, outcomes
    # sanity: the mutator actually exercises all outcome classes
    assert outcomes["ValueError"] > 0 and outcomes["EOFError"] > 0, outcomes


def test_read_message_hostile_lengths_raise_loud():
    """The specific hang/leak classes, pinned one by one."""
    good = _seed_messages()[0]

    def run(b: bytes):
        return hw._read_message(io.BytesIO(b))

    # negative method-name length: read(-1) on a socket file blocks
    # until the peer closes — must be a ValueError instead
    bad = bytearray(good)
    bad[4:8] = struct.pack(">i", -1)
    with pytest.raises(ValueError, match="method name length"):
        run(bytes(bad))
    # huge method-name length: slow-loris/memory — ValueError
    bad[4:8] = struct.pack(">i", 0x7FFFFFFF)
    with pytest.raises(ValueError, match="method name length"):
        run(bytes(bad))
    # non-UTF-8 method name: explicit protocol error, not a codec leak
    bad = bytearray(good)
    bad[8] = 0xFF
    with pytest.raises(ValueError, match="UTF-8"):
        run(bytes(bad))
    # bad version word (positive = old-style framing)
    bad = bytearray(good)
    bad[0] = 0x00
    with pytest.raises(ValueError, match="not supported"):
        run(bytes(bad))
    # negative word with the wrong version half
    bad[0:4] = struct.pack(">I", 0x90010001)
    with pytest.raises(ValueError, match="version"):
        run(bytes(bad))
    # truncated mid-header: clean EOFError
    with pytest.raises(EOFError):
        run(good[:6])


def test_struct_walker_hostile_containers():
    """_read_struct_bytes: negative/huge string lengths and container
    counts, deep nesting, and oversized structs all raise ValueError."""
    walk = hw._read_struct_bytes

    def struct_with(value_bytes: bytes, ttype: int) -> bytes:
        return hw._fld(1, ttype, value_bytes) + hw._stop()

    # negative string length
    with pytest.raises(ValueError, match="string length"):
        walk(io.BytesIO(struct_with(struct.pack(">i", -5), tp.T_STRING)))
    # string length over the wire cap
    with pytest.raises(ValueError, match="string length"):
        walk(
            io.BytesIO(
                struct_with(
                    struct.pack(">i", hw.MAX_WIRE_STRING + 1), tp.T_STRING
                )
            )
        )
    # huge list count (would loop 2^31 times on a socket)
    huge_list = struct.pack(">bi", tp.T_BOOL, 0x7FFFFFFF)
    with pytest.raises(ValueError, match="list count"):
        walk(io.BytesIO(struct_with(huge_list, tp.T_LIST)))
    # huge map count
    huge_map = struct.pack(">bbi", tp.T_BOOL, tp.T_BOOL, 0x7FFFFFFF)
    with pytest.raises(ValueError, match="map count"):
        walk(io.BytesIO(struct_with(huge_map, tp.T_MAP)))
    # nesting deeper than the cap: RecursionError before the fix
    deep = b""
    for _ in range(hw.MAX_NEST_DEPTH + 8):
        deep = hw._fld(1, tp.T_STRUCT, deep + hw._stop())
    with pytest.raises(ValueError, match="nesting"):
        walk(io.BytesIO(deep + hw._stop()))
    # unknown wire type is still a loud protocol error
    with pytest.raises(ValueError, match="wire type"):
        walk(io.BytesIO(bytes([99, 0, 1]) + hw._stop()))


def test_sasl_and_framed_io_hostile_lengths():
    """The SASL negotiation reader and the framed data transport
    validate frame lengths before sizing reads."""
    # negotiation: negative and huge lengths
    for ln in (-1, (1 << 20) + 1):
        msg = struct.pack(">bi", hw.SASL_START, ln)
        with pytest.raises(ValueError, match="frame length"):
            hw._sasl_read_msg(io.BytesIO(msg))
    # truncated header: clean EOFError
    with pytest.raises(EOFError):
        hw._sasl_read_msg(io.BytesIO(b"\x01\x00"))
    # framed transport: negative and huge data frame lengths
    for ln in (-1, hw.MAX_STRUCT_BYTES + 1):
        fio = hw._FramedIO(io.BytesIO(struct.pack(">i", ln)), io.BytesIO())
        with pytest.raises(ValueError, match="frame length"):
            fio.read(4)
    # a short frame (peer died mid-frame) signals EOF (empty read) so
    # the message loop closes cleanly instead of parsing a torn frame
    fio = hw._FramedIO(
        io.BytesIO(struct.pack(">i", 10) + b"abc"), io.BytesIO()
    )
    assert fio.read(10) == b""


def _drain(sock: socket.socket, deadline: float) -> bytes:
    out = b""
    while time.time() < deadline:
        try:
            chunk = sock.recv(65536)
        except socket.timeout:
            raise AssertionError(
                "server neither replied nor closed within the deadline "
                "(hang class)"
            ) from None
        if not chunk:
            break
        out += chunk
    return out


def test_server_survives_socket_fuzz_campaign(spark, sf_dir):
    """E2E: 80 seeded-mutation payloads fired at a LIVE server over
    real sockets. Every connection must resolve (reply or close)
    within its deadline, the serving loop must survive, and after the
    campaign a well-formed client round-trip still works with a
    consistent session registry."""
    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        rng = random.Random(0xF00D)
        seeds = _seed_messages()
        # include garbage first-bytes that select neither SASL nor
        # NOSASL cleanly, and raw noise
        extra = [b"\x05\x00\x00\x00\x00", b"GET / HTTP/1.1\r\n\r\n", b"\x00"]
        payloads = list(_mutations(seeds, rng, 80)) + extra
        for payload in payloads:
            with socket.create_connection(("127.0.0.1", port)) as s:
                s.settimeout(15)
                try:
                    s.sendall(payload)
                    s.shutdown(socket.SHUT_WR)
                except OSError:
                    continue  # server already dropped us — fine
                _drain(s, time.time() + 15)
        # the server still serves a full valid session
        cli = hw.HS2WireClient("127.0.0.1", port, sasl=False)
        cli.open_session()
        op = cli.execute("SELECT 1 AS one")
        rows, _more = cli.fetch(op)
        assert rows == [(1,)], rows
        cli.close()  # CloseSession + socket
        # registry consistency: no orphaned ops (every op belongs to a
        # live session), and the closed session is gone
        with srv._lock:
            assert set(srv.op_session) == set(srv.ops)
            for oid, sguid in srv.op_session.items():
                assert sguid in srv.sessions, (oid, sguid)
                assert oid in srv.session_ops.get(sguid, set())
    finally:
        srv.shutdown()


def test_sasl_handshake_socket_fuzz(spark):
    """Fuzz the SASL negotiation path specifically: mutated START /
    initial-response messages must get a SASL error or a close, never
    hang the accept thread, and the server keeps serving."""
    srv, port = hw.serve_background(spark, max_rows=10)
    try:
        rng = random.Random(0xBEEF)
        start = struct.pack(">bi", hw.SASL_START, 5) + b"PLAIN"
        resp = struct.pack(">bi", hw.SASL_COMPLETE, 7) + b"\x00u\x00p\x00x"
        for payload in _mutations([start, start + resp], rng, 60):
            # keep the first byte in SASL range so we fuzz the SASL
            # path, not the NOSASL fallback
            p = bytearray(payload)
            p[0] = rng.choice(
                [hw.SASL_START, hw.SASL_OK, hw.SASL_COMPLETE, 0x07]
            )
            with socket.create_connection(("127.0.0.1", port)) as s:
                s.settimeout(15)
                try:
                    s.sendall(bytes(p))
                    s.shutdown(socket.SHUT_WR)
                except OSError:
                    continue
                _drain(s, time.time() + 15)
        # a well-formed SASL client still negotiates and runs SQL
        cli = hw.HS2WireClient("127.0.0.1", port, sasl=True)
        cli.open_session()
        cli.close()
    finally:
        srv.shutdown()


def test_jsonrpc_server_fuzz_and_line_cap(spark, sf_dir):
    """The JSON-RPC entry point (scripts/sql_server.py) under the
    same contract: mutated/binary/oversized requests get a JSON error
    or a close — never a hang, never a serving-thread crash — and a
    valid request still works afterwards."""
    import json
    import os
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    import sql_server

    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = sql_server.serve_background(spark)
    try:
        rng = random.Random(0xD1CE)
        seeds = [
            json.dumps({"sql": "SELECT 1 AS one"}).encode() + b"\n",
            json.dumps({"sql": "SELECT count(*) FROM region"}).encode()
            + b"\n",
        ]
        payloads = list(_mutations(seeds, rng, 50)) + [
            b"\xff\xfe\x00\x01binary garbage\n",
            b'{"sql": 42}\n',  # non-string sql
            b'["not", "an", "object"]\n',
            b'{"nosql": "x"}\n',
        ]
        for payload in payloads:
            with socket.create_connection(("127.0.0.1", port)) as s:
                s.settimeout(15)
                try:
                    s.sendall(payload)
                    s.shutdown(socket.SHUT_WR)
                except OSError:
                    continue
                _drain(s, time.time() + 15)
        # over-long unterminated line: one error reply, then close —
        # the server must not buffer it without bound
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(30)
            s.sendall(b'{"sql": "' + b"x" * (sql_server.MAX_LINE_BYTES + 64))
            data = _drain(s, time.time() + 30)
            assert b"exceeds" in data, data[:200]
        # the server still answers a well-formed request
        out = sql_server.query(port, "SELECT 1 AS one")
        assert out == {
            "columns": ["one"],
            "rows": [["1"]],
            "truncated": False,
        }, out
    finally:
        srv.shutdown()

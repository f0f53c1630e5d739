"""HiveServer2 Thrift wire protocol — a REAL TCLIService endpoint.

Entry point B of the reference (``service/.../operation/
SQLOperation.java:76``; JDBC side ``jdbc/.../HiveStatement.java:57``)
speaks the Thrift TCLIService RPC protocol. The container has no
thrift library, so this module implements the WIRE FORMAT from
scratch on the repo's TBinaryProtocol primitives (sources/thrift_py,
public spec) plus the message/struct layouts from the reference's
own IDL — every field id below cites ``service/if/TCLIService.thrift``:

- RPC message (strict binary protocol): ``i32 0x8001|type``, method
  name as string, ``i32 seqid``, then the args/result struct.
  type: 1=CALL, 2=REPLY, 3=EXCEPTION.
- ``TOpenSessionReq`` (:555 — 1: client_protocol i32, 2: username,
  3: password, 4: configuration map) → ``TOpenSessionResp`` (:572 —
  1: TStatus, 2: serverProtocolVersion, 3: TSessionHandle).
- ``TExecuteStatementReq`` (:686 — 1: sessionHandle, 2: statement,
  3: confOverlay, 4: runAsync) → resp (1: status, 2: operationHandle).
- ``TGetResultSetMetadataReq``/``Resp`` (:1021/:1026 — TTableSchema
  :277 of TColumnDesc :262 {1: name, 2: TTypeDesc, 3: position}).
- ``TFetchResultsReq`` (:1061 — 1: op handle, 2: orientation,
  3: maxRows) → resp (:1077 — 1: status, 2: hasMoreRows,
  3: TRowSet :400 {1: startRowOffset, 2: rows}).
- handles: ``THandleIdentifier`` (:483 — 16-byte guid + secret),
  ``TSessionHandle`` (:497), ``TOperationHandle`` (:516).
- ``TStatus`` (:417 — 1: statusCode enum [SUCCESS=0, ERROR=3],
  3: sqlState, 5: errorMessage).
- row values: ``TRow`` (:339) of ``TColumnValue`` unions (:328 —
  exactly one field set: 1 bool, 2 byte, 3 i16, 4 i32, 5 i64,
  6 double, 7 string) — the ROW-based layout every protocol version
  supports (column-based TColumn arrived with V6); the server
  reports ``HIVE_CLI_SERVICE_PROTOCOL_V5`` accordingly.

Auth: the server auto-detects the transport from the first byte of a
connection, mirroring how ``HiveAuthFactory.java:67-115`` picks the
transport from hive.server2.authentication:

- **SASL/PLAIN** (stock client default — beeline/JDBC with no
  ``;auth=noSasl``): the thrift TSaslTransport handshake — messages
  of ``[status byte][i32 length][payload]`` with status START=1 OK=2
  BAD=3 ERROR=4 COMPLETE=5; client sends START("PLAIN") then the
  RFC-4616 initial response ``authzid NUL authcid NUL passwd``;
  server replies COMPLETE; thereafter every message travels in
  4-byte length-prefixed frames (PLAIN is auth-only QOP — payloads
  are never wrapped). Validation mirrors ``PlainSaslHelper.java`` +
  authentication=NONE (AnonymousAuthenticationProviderImpl): any
  non-empty authcid is accepted; LDAP/CUSTOM providers and Kerberos
  stay out of scope (deployment security layer).
- **NOSASL** (``jdbc:hive2://…;auth=noSasl``): raw unframed
  TBinaryProtocol — a first byte of 0x80 (the strict-protocol
  version word) selects this path.

Scale note: the server is an ENTRY POINT, not an executor — each
statement is planned and run by Spark. ExecuteStatement materializes
at most ``result_cap`` rows on the driver via ``take(result_cap+1)``
(a pushed GlobalLimit — never an unbounded collect); FetchResults
pages that buffer in ``maxRows`` batches, mirroring SQLOperation's
fetch path. A result wider than the cap is truncated at result_cap
rows; the drop is signalled IN-BAND — every FetchResults of a
truncated op (including the post-drain empty fetch that
loop-until-empty clients terminate on) carries a SUCCESS_WITH_INFO
TStatus with an infoMessage naming the cap, and the final non-empty
fetch additionally reports hasMoreRows=true — raise ``result_cap``
or add LIMIT for bigger result sets.
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import struct
import threading

from . import thrift_py as tp

CALL, REPLY, EXCEPTION = 1, 2, 3
VERSION_MASK = 0x80010000

# TProtocolVersion enum (TCLIService.thrift:35-62): V1=0 … V8=7
PROTOCOL_V5 = 4
PROTOCOL_V6 = 5
# TStatusCode (:408): SUCCESS=0, ERROR=3
SUCCESS, SUCCESS_WITH_INFO, ERROR = 0, 1, 3
# TOperationType (:502): EXECUTE_STATEMENT=0
OP_EXECUTE = 0

# TTypeId enum indexes (TCLIService.thrift:65-92)
TYPE_ID = {
    "boolean": 0,
    "tinyint": 1,
    "smallint": 2,
    "int": 3,
    "bigint": 4,
    "float": 5,
    "double": 6,
    "string": 7,
    "timestamp": 8,
    "binary": 9,
    "decimal": 15,
    "null": 16,
    "date": 17,
}

# TColumnValue union field id per Spark simpleString type
_VALUE_FIELD = {
    "boolean": (1, tp.T_BOOL),
    "tinyint": (2, tp.T_BYTE),
    "smallint": (3, tp.T_I16),
    "int": (4, tp.T_I32),
    "bigint": (5, tp.T_I64),
    "float": (6, tp.T_DOUBLE),
    "double": (6, tp.T_DOUBLE),
}


# ---------------------------------------------------------------------------
# generic struct-building helpers (field bytes → struct bytes)
# ---------------------------------------------------------------------------


def _fld(fid: int, ttype: int, payload: bytes) -> bytes:
    return struct.pack(">bh", ttype, fid) + payload


def _stop() -> bytes:
    return struct.pack(">b", tp.T_STOP)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _dbl(v: float) -> bytes:
    return struct.pack(">d", v)


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + b


def _binary(b: bytes) -> bytes:
    return struct.pack(">i", len(b)) + b


def _tlist(etype: int, items: list[bytes]) -> bytes:
    return struct.pack(">bi", etype, len(items)) + b"".join(items)


def _status(
    code: int,
    message: str | None = None,
    info: list[str] | None = None,
) -> bytes:
    out = _fld(1, tp.T_I32, _i32(code))
    if info:
        # TStatus field 2: infoMessages (list<string>) — carried on
        # SUCCESS_WITH_INFO so clients see in-band warnings
        out += _fld(
            2, tp.T_LIST, _tlist(tp.T_STRING, [_string(m) for m in info])
        )
    if message is not None:
        out += _fld(3, tp.T_STRING, _string("42000"))
        out += _fld(5, tp.T_STRING, _string(message))
    return out + _stop()


def _handle(guid: bytes) -> bytes:
    """THandleIdentifier: 16-byte guid + 16-byte secret."""
    ident = (
        _fld(1, tp.T_STRING, _binary(guid))
        + _fld(
            2,
            tp.T_STRING,
            _binary(hashlib.sha256(guid).hexdigest()[:16].encode()),
        )
        + _stop()
    )
    return _fld(1, tp.T_STRUCT, ident) + _stop()  # wrapper struct


# Corrupt-input contract bounds (verdict r12 #2 — the server parses
# attacker-controllable bytes off a socket, where a hang or an
# internal-error leak is strictly worse than in a file reader):
# every length/count read off the wire is validated BEFORE it sizes a
# read or a loop. A negative length would turn into read(-1) — which
# on a buffered socket file BLOCKS until the peer closes (an
# executor-thread hang a malicious or broken client controls); an
# unbounded one is a memory/slow-loris hazard.
MAX_METHOD_LEN = 1 << 12  # TCLIService method names are short ASCII
MAX_WIRE_STRING = 1 << 26  # 64 MiB — bounds one string/binary value
MAX_STRUCT_BYTES = 1 << 26  # 64 MiB — bounds one whole request struct
MAX_CONTAINER_ITEMS = 1 << 22  # bounds one list/map element loop
MAX_NEST_DEPTH = 64  # bounds recursion: deep nesting raised
# RecursionError (an internal-error leak) before this cap existed


def _need(sock_file, n: int) -> bytes:
    """Read exactly n bytes or raise EOFError — so a truncated stream
    surfaces as a clean connection-close, never as struct.error from
    unpacking a short buffer."""
    b = sock_file.read(n)
    if len(b) < n:
        raise EOFError
    return b


def _read_message(sock_file) -> tuple[str, int, list]:
    """Parse one strict-protocol message: returns (method, seqid,
    positional args struct). Raises EOFError on a clean/truncated
    close and ValueError on any protocol violation — no other
    exception type escapes (fuzz contract, tests/test_hs2_fuzz.py)."""
    head = sock_file.read(4)
    if len(head) < 4:
        raise EOFError
    (word,) = struct.unpack(">i", head)
    if word >= 0:
        raise ValueError(
            "old-style (non-strict) thrift framing not supported"
        )
    # word is a signed i32; Python's & against the positive mask
    # yields the unsigned high half — compare against 0x80010000
    if (word & 0xFFFF0000) != VERSION_MASK:
        raise ValueError(f"bad thrift protocol version word {word & 0xFFFFFFFF:#x}")
    mtype = word & 0xFF
    (nlen,) = struct.unpack(">i", _need(sock_file, 4))
    if not 0 <= nlen <= MAX_METHOD_LEN:
        raise ValueError(f"bad method name length {nlen}")
    try:
        name = _need(sock_file, nlen).decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"method name is not valid UTF-8: {exc}") from None
    (seqid,) = struct.unpack(">i", _need(sock_file, 4))
    if mtype != CALL:
        raise ValueError(f"unexpected message type {mtype}")
    # args struct: field 1 = the req struct. Read the full remaining
    # struct generically (thrift_py decodes nested structs
    # positionally).
    payload = _read_struct_bytes(sock_file)
    args = tp.decode_row(payload, 8)
    return name, seqid, args


def _read_struct_bytes(sock_file) -> bytes:
    """Consume one struct off the stream byte-exactly (fields until
    T_STOP, recursing into containers) and return its raw bytes.

    Fuzz contract: raises only EOFError (truncated stream) or
    ValueError (protocol violation). Every wire-supplied length/count
    is bounds-checked before it sizes a read or loop (negative →
    blocking read(-1); huge → memory / slow-loris), total struct size
    is capped, and nesting depth is capped so crafted deep nesting
    cannot raise RecursionError."""
    out = bytearray()

    def copy(n: int) -> bytes:
        if len(out) + n > MAX_STRUCT_BYTES:
            raise ValueError(
                f"request struct exceeds {MAX_STRUCT_BYTES} bytes"
            )
        b = sock_file.read(n)
        if len(b) < n:
            raise EOFError
        out.extend(b)
        return b

    def _count(n: int, what: str) -> int:
        if not 0 <= n <= MAX_CONTAINER_ITEMS:
            raise ValueError(f"bad {what} count {n}")
        return n

    def skip_value(tt: int, depth: int) -> None:
        if depth > MAX_NEST_DEPTH:
            raise ValueError(
                f"thrift nesting deeper than {MAX_NEST_DEPTH}"
            )
        if tt == tp.T_BOOL or tt == tp.T_BYTE:
            copy(1)
        elif tt == tp.T_I16:
            copy(2)
        elif tt == tp.T_I32:
            copy(4)
        elif tt in (tp.T_I64, tp.T_DOUBLE):
            copy(8)
        elif tt == tp.T_STRING:
            (n,) = struct.unpack(">i", copy(4))
            if not 0 <= n <= MAX_WIRE_STRING:
                raise ValueError(f"bad string length {n}")
            copy(n)
        elif tt == tp.T_STRUCT:
            while True:
                (ft,) = struct.unpack(">b", copy(1))
                if ft == tp.T_STOP:
                    return
                copy(2)
                skip_value(ft, depth + 1)
        elif tt == tp.T_MAP:
            kt, vt = struct.unpack(">bb", copy(2))
            (n,) = struct.unpack(">i", copy(4))
            for _ in range(_count(n, "map")):
                skip_value(kt, depth + 1)
                skip_value(vt, depth + 1)
        elif tt in (tp.T_LIST, 14):  # list / set share the layout
            (et,) = struct.unpack(">b", copy(1))
            (n,) = struct.unpack(">i", copy(4))
            for _ in range(_count(n, "list")):
                skip_value(et, depth + 1)
        else:
            raise ValueError(f"unknown thrift wire type {tt}")

    skip_value(tp.T_STRUCT, 0)
    return bytes(out)


def _reply(name: str, seqid: int, result_field: bytes) -> bytes:
    """REPLY message: result struct with field 0 = success value."""
    head = struct.pack(">I", VERSION_MASK | REPLY) + _string(name) + struct.pack(
        ">i", seqid
    )
    return head + _fld(0, tp.T_STRUCT, result_field) + _stop()


def _exception(name: str, seqid: int, message: str) -> bytes:
    """TApplicationException reply (1: message, 2: type=1 unknown
    method)."""
    head = struct.pack(">I", VERSION_MASK | EXCEPTION) + _string(
        name
    ) + struct.pack(">i", seqid)
    body = (
        _fld(1, tp.T_STRING, _string(message))
        + _fld(2, tp.T_I32, _i32(1))
        + _stop()
    )
    return head + body


# ---------------------------------------------------------------------------
# schema / row encoding
# ---------------------------------------------------------------------------


def _type_id_for(simple: str) -> int:
    if simple.startswith("decimal"):
        return TYPE_ID["decimal"]
    if simple.startswith(("array", "map", "struct")):
        # complex results render as strings (TColumnValue note :382)
        return TYPE_ID["string"]
    return TYPE_ID.get(simple, TYPE_ID["string"])


def _table_schema(df) -> bytes:
    """TTableSchema{1: list<TColumnDesc>}; TColumnDesc{1: name,
    2: TTypeDesc{1: list<TTypeEntry{1: TPrimitiveTypeEntry{1: id}}>},
    3: position}."""
    cols = []
    for pos, f in enumerate(df.schema.fields, start=1):
        prim = _fld(
            1, tp.T_I32, _i32(_type_id_for(f.dataType.simpleString()))
        ) + _stop()
        entry = _fld(1, tp.T_STRUCT, prim) + _stop()  # TTypeEntry union
        tdesc = _fld(1, tp.T_LIST, _tlist(tp.T_STRUCT, [entry])) + _stop()
        cols.append(
            _fld(1, tp.T_STRING, _string(f.name))
            + _fld(2, tp.T_STRUCT, tdesc)
            + _fld(3, tp.T_I32, _i32(pos))
            + _stop()
        )
    return _fld(1, tp.T_LIST, _tlist(tp.T_STRUCT, cols)) + _stop()


def _column_value(simple: str, v) -> bytes:
    """TColumnValue union — exactly one wrapper-struct field set; a
    NULL is a wrapper with its optional value field absent."""
    fid, wire = _VALUE_FIELD.get(simple, (7, tp.T_STRING))
    if v is None:
        inner = _stop()
    elif fid == 7:
        inner = _fld(1, tp.T_STRING, _string(str(v))) + _stop()
    elif wire == tp.T_BOOL:
        inner = _fld(1, tp.T_BOOL, struct.pack(">b", 1 if v else 0)) + _stop()
    elif wire == tp.T_BYTE:
        inner = _fld(1, tp.T_BYTE, struct.pack(">b", int(v))) + _stop()
    elif wire == tp.T_I16:
        inner = _fld(1, tp.T_I16, struct.pack(">h", int(v))) + _stop()
    elif wire == tp.T_I32:
        inner = _fld(1, tp.T_I32, _i32(int(v))) + _stop()
    elif wire == tp.T_I64:
        inner = _fld(1, tp.T_I64, _i64(int(v))) + _stop()
    else:
        inner = _fld(1, tp.T_DOUBLE, _dbl(float(v))) + _stop()
    return _fld(fid, tp.T_STRUCT, inner) + _stop()


def _row_set(df, rows, start_offset: int, columnar: bool = False) -> bytes:
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    if not columnar:
        trows = []
        for r in rows:
            vals = [_column_value(s, v) for s, v in zip(simples, r)]
            trows.append(
                _fld(1, tp.T_LIST, _tlist(tp.T_STRUCT, vals)) + _stop()
            )
        return (
            _fld(1, tp.T_I64, _i64(start_offset))
            + _fld(2, tp.T_LIST, _tlist(tp.T_STRUCT, trows))
            + _stop()
        )
    # COLUMN-based TRowSet (protocol V6+, TCLIService.thrift:344-398):
    # field 3 = list<TColumn>; each TColumn union wraps
    # T*Column{1: list<values>, 2: binary nulls} — nulls is a
    # little-endian bitmask (bit i set = row i NULL) and the values
    # list carries type-default placeholders at null slots. The
    # REQUIRED rows field (2) is sent empty, exactly as Hive does
    # when serving columnar rowsets.
    cols = []
    for ci, simple in enumerate(simples):
        fid, wire = _VALUE_FIELD.get(simple, (7, tp.T_STRING))
        nulls = bytearray((len(rows) + 7) // 8)
        vals: list[bytes] = []
        for ri, r in enumerate(rows):
            v = r[ci]
            if v is None:
                nulls[ri // 8] |= 1 << (ri % 8)
            if fid == 7:
                vals.append(_string("" if v is None else str(v)))
            elif wire == tp.T_BOOL:
                vals.append(struct.pack(">b", 1 if v else 0))
            elif wire == tp.T_BYTE:
                vals.append(struct.pack(">b", 0 if v is None else int(v)))
            elif wire == tp.T_I16:
                vals.append(struct.pack(">h", 0 if v is None else int(v)))
            elif wire == tp.T_I32:
                vals.append(_i32(0 if v is None else int(v)))
            elif wire == tp.T_I64:
                vals.append(_i64(0 if v is None else int(v)))
            else:
                vals.append(_dbl(0.0 if v is None else float(v)))
        inner = (
            _fld(1, tp.T_LIST, _tlist(wire if fid != 7 else tp.T_STRING, vals))
            + _fld(2, tp.T_STRING, _binary(bytes(nulls)))
            + _stop()
        )
        cols.append(_fld(fid, tp.T_STRUCT, inner) + _stop())
    return (
        _fld(1, tp.T_I64, _i64(start_offset))
        + _fld(2, tp.T_LIST, _tlist(tp.T_STRUCT, []))
        + _fld(3, tp.T_LIST, _tlist(tp.T_STRUCT, cols))
        + _stop()
    )


# ---------------------------------------------------------------------------
# SASL/PLAIN transport layer (thrift TSaslTransport wire, public spec;
# reference: service/.../auth/HiveAuthFactory.java + PlainSaslHelper.java)
# ---------------------------------------------------------------------------

# TSaslTransport.NegotiationStatus byte codes
SASL_START, SASL_OK, SASL_BAD, SASL_ERROR, SASL_COMPLETE = 1, 2, 3, 4, 5


def _sasl_read_msg(rfile) -> tuple[int, bytes]:
    head = rfile.read(5)
    if len(head) < 5:
        raise EOFError
    status, ln = struct.unpack(">bi", head)
    if ln < 0 or ln > 1 << 20:  # handshake payloads are tiny
        raise ValueError(f"bad SASL negotiation frame length {ln}")
    return status, rfile.read(ln)


def _sasl_write_msg(wfile, status: int, payload: bytes = b"") -> None:
    wfile.write(struct.pack(">bi", status, len(payload)) + payload)
    wfile.flush()


class _FramedIO:
    """TSaslTransport data phase: 4-byte length-prefixed frames.
    PLAIN negotiates auth-only QOP, so payloads travel unwrapped —
    the frame IS the transport. One flush() = one frame, matching
    the Java transport's per-message flush."""

    def __init__(self, rfile, wfile):
        self._r = rfile
        self._w = wfile
        self._buf = b""
        self._pos = 0
        self._pending = b""

    def read(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            if self._pos >= len(self._buf):
                head = self._r.read(4)
                if len(head) < 4:
                    break
                (ln,) = struct.unpack(">i", head)
                if not 0 <= ln <= MAX_STRUCT_BYTES:
                    raise ValueError(f"bad SASL data frame length {ln}")
                self._buf = self._r.read(ln)
                self._pos = 0
                if len(self._buf) < ln:
                    break
            take = min(n - len(out), len(self._buf) - self._pos)
            out += self._buf[self._pos : self._pos + take]
            self._pos += take
        return bytes(out)

    def write(self, b: bytes) -> None:
        self._pending += b

    def flush(self) -> None:
        if self._pending:
            self._w.write(struct.pack(">i", len(self._pending)) + self._pending)
            self._w.flush()
            self._pending = b""


def _sasl_server_handshake(rfile, wfile) -> "_FramedIO | None":
    """Server side of the PLAIN negotiation; returns the framed
    transport on success, None after sending BAD/ERROR."""
    status, mech = _sasl_read_msg(rfile)
    if status != SASL_START:
        _sasl_write_msg(wfile, SASL_ERROR, b"expected SASL START")
        return None
    if mech != b"PLAIN":
        # unsupported mechanism -> BAD, like TSaslServerTransport when
        # the mechanism isn't registered
        _sasl_write_msg(
            wfile, SASL_BAD, b"unsupported mechanism " + mech[:64]
        )
        return None
    status, resp = _sasl_read_msg(rfile)
    if status not in (SASL_OK, SASL_COMPLETE):
        _sasl_write_msg(wfile, SASL_ERROR, b"expected initial response")
        return None
    parts = resp.split(b"\x00")
    # RFC 4616: authzid NUL authcid NUL passwd; authcid must be
    # non-empty (PlainSaslHelper rejects null user; with
    # authentication=NONE any non-empty user/password pair passes)
    if len(parts) != 3 or not parts[1]:
        _sasl_write_msg(
            wfile, SASL_ERROR, b"PLAIN: malformed or empty authcid"
        )
        return None
    _sasl_write_msg(wfile, SASL_COMPLETE, b"")
    return _FramedIO(rfile, wfile)


def _sasl_client_handshake(rfile, wfile, user: str, password: str) -> "_FramedIO":
    """Client side: START(PLAIN), COMPLETE(initial response), expect
    server COMPLETE (PLAIN finishes in one round trip)."""
    _sasl_write_msg(wfile, SASL_START, b"PLAIN")
    initial = b"\x00" + user.encode("utf-8") + b"\x00" + password.encode("utf-8")
    _sasl_write_msg(wfile, SASL_COMPLETE, initial)
    status, payload = _sasl_read_msg(rfile)
    if status != SASL_COMPLETE:
        raise RuntimeError(
            f"SASL negotiation failed (status {status}): "
            f"{payload.decode('utf-8', 'replace')}"
        )
    return _FramedIO(rfile, wfile)


# ---------------------------------------------------------------------------
# the server
# ---------------------------------------------------------------------------


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # noqa: C901 — one dispatch table
        srv = self.server
        rfile = wfile = None
        try:
            first = self.rfile.peek(1)[:1]
        except (OSError, ValueError):
            return
        if first == bytes([SASL_START]):
            try:
                framed = _sasl_server_handshake(self.rfile, self.wfile)
            except (EOFError, ConnectionError, ValueError):
                return
            if framed is None:
                return
            rfile = wfile = framed
        else:
            # 0x80: strict-protocol version word -> NOSASL raw transport
            rfile, wfile = self.rfile, self.wfile
        while True:
            try:
                name, seqid, args = _read_message(rfile)
            except (EOFError, ConnectionError):
                return
            except ValueError as exc:
                # protocol violation (fuzz contract): answer with a
                # best-effort TApplicationException and DROP the
                # connection — the stream position is untrustworthy
                # after a framing error, so continuing would misparse
                # every subsequent byte. The server (other threads,
                # session registry) is unaffected.
                try:
                    wfile.write(_exception("", 0, f"protocol error: {exc}"))
                    wfile.flush()
                except (OSError, ValueError):
                    pass
                return
            try:
                out = self._dispatch(srv, name, seqid, args)
            except Exception as exc:  # noqa: BLE001 — wire errors out
                out = _exception(name, seqid, f"{type(exc).__name__}: {exc}")
            try:
                wfile.write(out)
                wfile.flush()
            except (OSError, ValueError):
                return  # peer went away mid-reply; nothing to salvage

    def _dispatch(self, srv, name: str, seqid: int, args: list) -> bytes:
        if name == "OpenSession":
            sid = srv.new_id()
            srv.add_session(sid)
            resp = (
                _fld(1, tp.T_STRUCT, _status(SUCCESS))
                + _fld(2, tp.T_I32, _i32(srv.protocol))
                + _fld(3, tp.T_STRUCT, _handle(sid))
                + _stop()
            )
            return _reply(name, seqid, resp)
        if name == "ExecuteStatement":
            # args[0] = TExecuteStatementReq positional: [sessionHandle,
            # statement, confOverlay, runAsync]
            statement = args[0][1]
            try:
                from ..catalog import ensure_parity_confs

                ensure_parity_confs(srv.spark)
                df = srv.spark.sql(statement)
                oid = srv.new_id()
                # materialize AT MOST result_cap (+1 sentinel) rows —
                # take() pushes a GlobalLimit into the plan so the
                # driver never holds an unbounded result set;
                # FetchResults pages through this in max_rows batches
                # (SQLOperation streams from FetchTask; a bounded take
                # is the single-process analogue — raise result_cap
                # for bigger result sets, or add LIMIT)
                rows = df.take(srv.result_cap + 1)
                truncated = len(rows) > srv.result_cap
                # track the op under its session so CloseSession can
                # free the buffers of clients that never CloseOperation;
                # a refused registration (session closed mid-statement
                # on another connection, or never opened) drops the
                # buffer here instead of leaking it under a session
                # nobody will close again
                if not srv.register_op(
                    self._req_guid(args), oid,
                    (df, rows[: srv.result_cap], 0, truncated),
                ):
                    return _reply(
                        name, seqid,
                        self._invalid_session(self._req_guid(args)),
                    )
                resp = (
                    _fld(1, tp.T_STRUCT, _status(SUCCESS))
                    + _fld(
                        2,
                        tp.T_STRUCT,
                        self._op_handle(oid),
                    )
                    + _stop()
                )
            except Exception as exc:  # noqa: BLE001 — SQL errors → TStatus
                resp = (
                    _fld(
                        1,
                        tp.T_STRUCT,
                        _status(ERROR, f"{type(exc).__name__}: {exc}"),
                    )
                    + _stop()
                )
            return _reply(name, seqid, resp)
        if name == "GetResultSetMetadata":
            oid = self._req_guid(args)
            entry = srv.get_op(oid)  # one locked read — no TOCTOU
            if entry is None:
                return _reply(name, seqid, self._invalid_handle(oid))
            df = entry[0]
            resp = (
                _fld(1, tp.T_STRUCT, _status(SUCCESS))
                + _fld(2, tp.T_STRUCT, _table_schema(df))
                + _stop()
            )
            return _reply(name, seqid, resp)
        if name == "FetchResults":
            oid = self._req_guid(args)
            entry = srv.get_op(oid)  # locked read — no TOCTOU
            if entry is None:
                # a handle freed by CloseOperation/CloseSession (or
                # never issued) fails loudly, like real HS2's
                # "Invalid OperationHandle" HiveSQLException —
                # CLOSED-as-success would let a poller read a freed
                # op as a legitimately finished empty result
                return _reply(name, seqid, self._invalid_handle(oid))
            truncated = entry[3]  # immutable after registration
            if truncated and srv.strict_truncation:
                # --strict-truncation: partial results are a hard
                # error, not data + SUCCESS_WITH_INFO
                resp = (
                    _fld(
                        1,
                        tp.T_STRUCT,
                        _status(
                            ERROR,
                            f"result truncated at result_cap="
                            f"{srv.result_cap} rows and the server "
                            "runs --strict-truncation; raise "
                            "--result-cap or add LIMIT",
                        ),
                    )
                    + _stop()
                )
                return _reply(name, seqid, resp)
            # honor the CLIENT's maxRows (TFetchResultsReq field 3 —
            # Hive does); the server cap only bounds it above
            try:
                want = int(args[0][2])
            except (TypeError, IndexError):
                want = srv.max_rows
            want = max(1, min(want or srv.max_rows, srv.max_rows))
            # read-slice-publish under ONE lock: two concurrent
            # fetches of the same handle must never serve the same
            # batch twice (the unlocked read-modify-write did)
            adv = srv.advance_op(oid, want)
            if adv is None:  # freed between the check and the advance
                return _reply(name, seqid, self._invalid_handle(oid))
            df, rows, served, batch, truncated = adv
            # hasMoreRows: true while the buffer has rows left, and
            # also on the FINAL non-empty batch of a result the server
            # truncated at result_cap (truthful signal that rows were
            # dropped); an empty fetch always reports false so pollers
            # that ignore empty batches still terminate.
            more = (served + len(batch) < len(rows)) or (
                truncated and len(batch) > 0
            )
            # In-band truncation signal (ADVICE r8): EVERY fetch of a
            # truncated op — including the post-drain empty fetch that
            # loop-until-empty clients terminate on — carries
            # SUCCESS_WITH_INFO + an infoMessage, so a stock client
            # cannot mistake a capped result for a complete one.
            # (Real HS2 streams the full result via FetchTask; this
            # single-process server bounds driver memory instead and
            # must therefore say so on the wire.)
            st = (
                _status(
                    SUCCESS_WITH_INFO,
                    info=[
                        f"result truncated at result_cap={srv.result_cap} "
                        "rows; raise --result-cap or add LIMIT"
                    ],
                )
                if truncated
                else _status(SUCCESS)
            )
            resp = (
                _fld(1, tp.T_STRUCT, st)
                + _fld(2, tp.T_BOOL, struct.pack(">b", 1 if more else 0))
                + _fld(
                    3,
                    tp.T_STRUCT,
                    _row_set(
                        df, batch, served,
                        columnar=srv.protocol >= PROTOCOL_V6,
                    ),
                )
                + _stop()
            )
            return _reply(name, seqid, resp)
        if name == "GetOperationStatus":
            # TGetOperationStatusResp (:973): 2 = TOperationState —
            # execution is synchronous inside ExecuteStatement, so a
            # known handle is always FINISHED_STATE (2). An UNKNOWN
            # handle (freed by CloseOperation/CloseSession, or never
            # issued) is an ERROR TStatus, matching real HS2's
            # "Invalid OperationHandle" HiveSQLException — not a
            # CLOSED state a poller could mistake for a clean finish.
            oid = self._req_guid(args)
            if oid not in srv.ops:
                return _reply(name, seqid, self._invalid_handle(oid))
            resp = (
                _fld(1, tp.T_STRUCT, _status(SUCCESS))
                + _fld(2, tp.T_I32, _i32(2))  # FINISHED_STATE
                + _stop()
            )
            return _reply(name, seqid, resp)
        if name == "GetColumns":
            # TGetColumnsReq (:840): 1 session, 2 catalog, 3 schema
            # pattern, 4 table pattern, 5 column pattern. Result set
            # uses the ODBC column layout (subset: the fields JDBC
            # tooling reads).
            spark = srv.spark
            table_pat = args[0][3] if len(args[0]) > 3 else None
            rows = []
            for t in spark.catalog.listTables():
                if table_pat and table_pat not in ("%", None, "")                         and table_pat != t.name:
                    continue
                for pos, c in enumerate(
                    spark.catalog.listColumns(t.name), start=1
                ):
                    rows.append(
                        (None, "default", t.name, c.name,
                         c.dataType, pos)
                    )
            df = spark.createDataFrame(
                rows or [(None, "d", "t", "c", "string", 1)],
                "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string, "
                "COLUMN_NAME string, TYPE_NAME string, ORDINAL_POSITION int",
            )
            if not rows:
                df = df.limit(0)
            return self._finish_metadata_op(srv, args, name, seqid, df)
        if name in ("GetTables", "GetSchemas", "GetCatalogs", "GetTableTypes"):
            # JDBC metadata surface (TCLIService.thrift:757-867):
            # result sets with the ODBC-standard columns, served
            # through the same operation/fetch machinery. Catalog =
            # the session's temp views (the engine's table surface).
            spark = srv.spark
            if name == "GetTables":
                tables = sorted(
                    t.name for t in spark.catalog.listTables()
                )
                df = spark.createDataFrame(
                    [(None, "default", t, "TABLE", None) for t in tables]
                    or [(None, "default", "__none__", "TABLE", None)],
                    "TABLE_CAT string, TABLE_SCHEM string, "
                    "TABLE_NAME string, TABLE_TYPE string, REMARKS string",
                )
                if not tables:
                    df = df.limit(0)
            elif name == "GetSchemas":
                df = spark.createDataFrame(
                    [("default", None)],
                    "TABLE_SCHEM string, TABLE_CATALOG string",
                )
            elif name == "GetTableTypes":
                df = spark.createDataFrame(
                    [("TABLE",)], "TABLE_TYPE string"
                )
            else:  # GetCatalogs: Hive has a single flat catalog
                df = spark.createDataFrame(
                    [("x",)], "TABLE_CAT string"
                ).limit(0)
            return self._finish_metadata_op(srv, args, name, seqid, df)
        if name == "GetFunctions":
            # TGetFunctionsReq (:880): 1 session, 2 catalog, 3 schema
            # pattern, 4 function pattern. Served straight from the
            # engine's SQL function registry (SHOW FUNCTIONS parity —
            # the same surface ddl_show_functions audits), ODBC
            # getFunctions() layout; '%'/None = all, else exact name.
            spark = srv.spark
            fn_pat = args[0][3] if len(args[0]) > 3 else None
            names_all = [
                r[0] for r in spark.sql("SHOW FUNCTIONS").collect()
            ]
            if fn_pat and fn_pat not in ("%", ""):
                names_all = [n for n in names_all if n == fn_pat]
            df = spark.createDataFrame(
                [(None, None, n, None, 1, n) for n in names_all]
                or [(None, None, "__none__", None, 1, "__none__")],
                "FUNCTION_CAT string, FUNCTION_SCHEM string, "
                "FUNCTION_NAME string, REMARKS string, "
                "FUNCTION_TYPE int, SPECIFIC_NAME string",
            )
            if not names_all:
                df = df.limit(0)
            return self._finish_metadata_op(srv, args, name, seqid, df)
        if name == "GetTypeInfo":
            # TGetTypeInfoReq (:747): the static ODBC type table a
            # driver caches at connect (java.sql.Types codes; the
            # subset ODBC/JDBC tooling actually reads).
            spark = srv.spark
            types = [
                ("BOOLEAN", 16), ("TINYINT", -6), ("SMALLINT", 5),
                ("INT", 4), ("BIGINT", -5), ("FLOAT", 6),
                ("DOUBLE", 8), ("STRING", 12), ("CHAR", 1),
                ("VARCHAR", 12), ("DATE", 91), ("TIMESTAMP", 93),
                ("BINARY", -2), ("DECIMAL", 3), ("ARRAY", 2003),
                ("MAP", 2000), ("STRUCT", 2002),
            ]
            df = spark.createDataFrame(
                [(n, c, None) for n, c in types],
                "TYPE_NAME string, DATA_TYPE int, PRECISION int",
            )
            return self._finish_metadata_op(srv, args, name, seqid, df)
        if name in ("CloseOperation", "CloseSession", "CancelOperation"):
            if name == "CloseOperation":
                # frees the buffer AND the guid's membership in the
                # owning session's set — a long-lived session that
                # properly closes its operations must not grow its
                # op list without bound
                srv.close_op(self._req_guid(args))
            elif name == "CloseSession":
                # free every op buffer the session left open — real
                # HS2 closes a session's operations with it
                # (HiveSessionImpl.close); without this a long-lived
                # server slowly accumulates result buffers from
                # clients that only ever CloseSession
                srv.close_session_ops(self._req_guid(args))
            resp = _fld(1, tp.T_STRUCT, _status(SUCCESS)) + _stop()
            return _reply(name, seqid, resp)
        return _exception(name, seqid, f"unimplemented method {name!r}")

    @staticmethod
    def _invalid_session(sguid: bytes) -> bytes:
        """ERROR TStatus for an unknown/closed session handle — the
        wire shape of HS2's ``Invalid SessionHandle``
        HiveSQLException (session/SessionManager.getSession)."""
        return (
            _fld(
                1,
                tp.T_STRUCT,
                _status(
                    ERROR,
                    f"Invalid SessionHandle: {sguid!r} "
                    "(closed or never opened)",
                ),
            )
            + _stop()
        )

    def _finish_metadata_op(self, srv, args, name, seqid, df) -> bytes:
        """Shared tail of every metadata handler: collect the bounded
        result, register it under the requesting session (so
        CloseSession frees metadata buffers too — a
        close-session-only JDBC client that browses catalog metadata
        must not leak), and reply with the op handle; a dead session
        gets the invalid-session error instead of a leaked buffer."""
        oid = srv.new_id()
        if not srv.register_op(
            self._req_guid(args), oid, (df, df.collect(), 0, False)
        ):
            return _reply(
                name, seqid, self._invalid_session(self._req_guid(args))
            )
        resp = (
            _fld(1, tp.T_STRUCT, _status(SUCCESS))
            + _fld(2, tp.T_STRUCT, self._op_handle(oid))
            + _stop()
        )
        return _reply(name, seqid, resp)

    @staticmethod
    def _invalid_handle(oid: bytes) -> bytes:
        """ERROR TStatus for an unknown operation handle — the wire
        shape of HS2's ``Invalid OperationHandle`` HiveSQLException
        (operation/OperationManager.getOperation)."""
        return (
            _fld(
                1,
                tp.T_STRUCT,
                _status(
                    ERROR,
                    "Invalid OperationHandle: "
                    f"{oid.decode('latin-1', 'replace')} "
                    "(closed or never issued)",
                ),
            )
            + _stop()
        )

    @staticmethod
    def _op_handle(guid: bytes) -> bytes:
        """TOperationHandle{1: THandleIdentifier, 2: opType,
        3: hasResultSet}."""
        ident = (
            _fld(1, tp.T_STRING, _binary(guid))
            + _fld(
                2,
                tp.T_STRING,
                _binary(hashlib.sha256(guid).hexdigest()[:16].encode()),
            )
            + _stop()
        )
        return (
            _fld(1, tp.T_STRUCT, ident)
            + _fld(2, tp.T_I32, _i32(OP_EXECUTE))
            + _fld(3, tp.T_BOOL, struct.pack(">b", 1))
            + _stop()
        )

    @staticmethod
    def _req_guid(args: list) -> bytes:
        """Pull the 16-byte guid out of req.field1 (a handle struct
        whose field 1 is THandleIdentifier{1: guid})."""
        handle = args[0][0]
        ident = handle[0]
        guid = ident[0]
        return guid if isinstance(guid, bytes) else guid.encode("latin-1")


class HS2WireServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = 1000, result_cap: int = 100_000,
                 protocol: int = PROTOCOL_V5,
                 strict_truncation: bool = False):
        super().__init__((host, port), _Handler)
        self.spark = spark
        self.max_rows = max_rows
        self.result_cap = result_cap
        self.protocol = protocol  # V5 row-based / V6+ column-based
        # strict mode: a fetch of a result the server truncated at
        # result_cap returns an ERROR TStatus instead of data +
        # SUCCESS_WITH_INFO — for clients that must never act on a
        # partial result set
        self.strict_truncation = strict_truncation
        self.ops: dict[bytes, tuple] = {}
        # session guid -> op guids, so CloseSession frees buffers of
        # clients that never CloseOperation (HiveSessionImpl parity);
        # op guid -> session guid so CloseOperation can also shrink
        # the owning session's set (a long-lived well-behaved session
        # must not grow its op list without bound)
        self.session_ops: dict[bytes, set[bytes]] = {}
        self.op_session: dict[bytes, bytes] = {}
        # LIVE sessions (OpenSession adds, CloseSession removes):
        # register_op refuses a dead/unknown session, so an
        # ExecuteStatement racing CloseSession on another connection
        # cannot park its result buffer under a session nobody will
        # ever close again (the leak a mere lock cannot prevent —
        # close_session_ops finds nothing when it runs FIRST)
        self.sessions: set[bytes] = set()
        self._counter = 0
        self._lock = threading.Lock()

    # -- operation lifecycle (all mutations under _lock: a client
    # closing its session concurrently with an in-flight
    # ExecuteStatement on another connection must not leak the op
    # buffer — the ops entry and its session_ops membership are
    # published atomically) --

    def add_session(self, sguid: bytes) -> None:
        with self._lock:
            self.sessions.add(sguid)

    def register_op(self, sguid: bytes, oid: bytes, entry: tuple) -> bool:
        """Publish an op atomically under a LIVE session. Returns
        False (registering nothing) when the session is unknown or
        was closed concurrently — the caller must answer with an
        invalid-session error instead of handing out a handle whose
        buffer no CloseSession will ever free."""
        with self._lock:
            if sguid not in self.sessions:
                return False
            self.ops[oid] = entry
            self.op_session[oid] = sguid
            self.session_ops.setdefault(sguid, set()).add(oid)
            return True

    def get_op(self, oid: bytes):
        """Locked snapshot read — a bare `oid in ops` check followed
        by an unlocked ops[oid] read races CloseOperation into a raw
        KeyError (sent as an opaque TApplicationException instead of
        the Invalid-OperationHandle TStatus)."""
        with self._lock:
            return self.ops.get(oid)

    def advance_op(self, oid: bytes, want: int):
        """Atomic fetch-cursor advance: read, slice, and publish the
        new served offset under one lock so two concurrent fetches of
        the same handle can never serve the same batch twice. Returns
        (df, rows, served_before, batch, truncated) or None if the
        handle was freed."""
        with self._lock:
            entry = self.ops.get(oid)
            if entry is None:
                return None
            df, rows, served, truncated = entry
            batch = rows[served : served + want]
            self.ops[oid] = (df, rows, served + len(batch), truncated)
            return df, rows, served, batch, truncated

    def close_op(self, oid: bytes) -> None:
        with self._lock:
            self.ops.pop(oid, None)
            sguid = self.op_session.pop(oid, None)
            if sguid is not None:
                owned = self.session_ops.get(sguid)
                if owned is not None:
                    owned.discard(oid)
                    if not owned:
                        self.session_ops.pop(sguid, None)

    def close_session_ops(self, sguid: bytes) -> None:
        with self._lock:
            self.sessions.discard(sguid)
            for oid in self.session_ops.pop(sguid, ()):
                self.ops.pop(oid, None)
                self.op_session.pop(oid, None)

    def new_id(self) -> bytes:
        with self._lock:
            self._counter += 1
            n = self._counter
        # hex-ASCII guid: THandleIdentifier allows any 16 bytes, and
        # ASCII survives the codec's utf-8 string decode unchanged
        return hashlib.sha256(f"hs2-handle-{n}".encode()).hexdigest()[:16].encode()


def serve_background(spark, port: int = 0, max_rows: int = 1000,
                     result_cap: int = 100_000,
                     protocol: int = PROTOCOL_V5,
                     strict_truncation: bool = False):
    """Start the wire server on a daemon thread; returns
    (server, bound_port)."""
    srv = HS2WireServer(spark, port=port, max_rows=max_rows,
                        result_cap=result_cap, protocol=protocol,
                        strict_truncation=strict_truncation)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


# ---------------------------------------------------------------------------
# a minimal client (same codec — used by tests and sql tooling)
# ---------------------------------------------------------------------------


class HS2WireClient:
    """TCLIService client speaking the same strict binary protocol —
    the library-free analogue of ``jdbc/.../HiveConnection.java`` +
    ``HiveStatement``. Defaults to SASL/PLAIN like a stock JDBC URL
    (no ``;auth=noSasl``); pass ``sasl=False`` for the NOSASL raw
    transport."""

    def __init__(self, host: str, port: int, *, sasl: bool = True,
                 user: str = "anonymous", password: str = "anonymous"):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("rb")
        self.wfile = self.sock.makefile("wb")
        try:
            if sasl:
                framed = _sasl_client_handshake(
                    self.rfile, self.wfile, user, password
                )
                self._in = framed
                self._out = framed
            else:
                self._in = self.rfile
                self._out = self.wfile
        except BaseException:
            # a failed handshake (RuntimeError on non-COMPLETE status)
            # must not leak the socket/file objects — close() is
            # unreachable when __init__ raises. Each close is guarded:
            # wfile.close() flushes and can itself raise (e.g.
            # BrokenPipeError on a reset connection), which must not
            # skip sock.close() or mask the handshake error.
            import contextlib

            with contextlib.suppress(OSError):
                self.rfile.close()
            with contextlib.suppress(OSError):
                self.wfile.close()
            with contextlib.suppress(OSError):
                self.sock.close()
            raise
        self.seq = 0
        self.session: bytes | None = None
        # TStatus of the most recent FetchResults: (code, infoMessages)
        # — SUCCESS_WITH_INFO + an infoMessage marks a result the
        # server truncated at result_cap
        self.last_fetch_status: tuple[int, list[str]] = (SUCCESS, [])

    def _call(self, name: str, req_struct: bytes) -> list:
        self.seq += 1
        msg = (
            struct.pack(">I", VERSION_MASK | CALL)
            + _string(name)
            + struct.pack(">i", self.seq)
            + _fld(1, tp.T_STRUCT, req_struct)
            + _stop()
        )
        self._out.write(msg)
        self._out.flush()
        head = self._in.read(4)
        (word,) = struct.unpack(">i", head)
        mtype = word & 0xFF
        (nlen,) = struct.unpack(">i", self._in.read(4))
        self._in.read(nlen)  # echo of the name
        self._in.read(4)  # seqid
        payload = _read_struct_bytes(self._in)
        if mtype == EXCEPTION:
            exc = tp.decode_row(payload, 2)
            raise RuntimeError(f"server exception: {exc[0]}")
        # result struct: field 0 is success — decode_row is 1-based,
        # so re-tag field 0 as field 1 for decoding
        retagged = bytearray(payload)
        # field header: [type:1][fid:2]; fid 0 → 1
        retagged[1:3] = struct.pack(">h", 1)
        return tp.decode_row(bytes(retagged), 1)[0]

    def open_session(self) -> None:
        req = (
            _fld(1, tp.T_I32, _i32(PROTOCOL_V5))
            + _fld(2, tp.T_STRING, _string("anonymous"))
            + _stop()
        )
        resp = self._call("OpenSession", req)
        # resp: [TStatus, protocol i32, TSessionHandle]
        status = resp[0]
        if status[0] != SUCCESS:
            raise RuntimeError(f"OpenSession failed: {status}")
        self.session = resp[2][0][0]
        if isinstance(self.session, str):
            self.session = self.session.encode("latin-1")

    def _handle_struct(self, guid: bytes) -> bytes:
        ident = (
            _fld(1, tp.T_STRING, _binary(guid))
            + _fld(2, tp.T_STRING, _binary(b"\x00" * 16))
            + _stop()
        )
        return _fld(1, tp.T_STRUCT, ident) + _stop()

    def _op_struct(self, guid: bytes) -> bytes:
        ident = (
            _fld(1, tp.T_STRING, _binary(guid))
            + _fld(2, tp.T_STRING, _binary(b"\x00" * 16))
            + _stop()
        )
        return (
            _fld(1, tp.T_STRUCT, ident)
            + _fld(2, tp.T_I32, _i32(OP_EXECUTE))
            + _fld(3, tp.T_BOOL, b"\x01")
            + _stop()
        )

    def execute(self, sql: str) -> bytes:
        req = (
            _fld(1, tp.T_STRUCT, self._handle_struct(self.session))
            + _fld(2, tp.T_STRING, _string(sql))
            + _stop()
        )
        resp = self._call("ExecuteStatement", req)
        status = resp[0]
        if status[0] != SUCCESS:
            raise RuntimeError(f"SQL error: {status[4] if len(status) > 4 else status}")
        guid = resp[1][0][0]
        return guid if isinstance(guid, bytes) else guid.encode("latin-1")

    def schema(self, op: bytes) -> list[tuple[str, int]]:
        req = _fld(1, tp.T_STRUCT, self._op_struct(op)) + _stop()
        resp = self._call("GetResultSetMetadata", req)
        status = resp[0]
        if status[0] == ERROR:
            # invalid/closed handle — surface the server's message
            # (the status-only reply has no schema struct; indexing
            # into it would raise an uninformative IndexError)
            msg = status[4] if len(status) > 4 else status
            raise RuntimeError(f"GetResultSetMetadata failed: {msg}")
        cols = resp[1][0]
        out = []
        for c in cols:
            name = c[0]
            type_id = c[1][0][0][0][0]
            out.append((name, type_id))
        return out

    def fetch(self, op: bytes, max_rows: int = 1000) -> tuple[list, bool]:
        req = (
            _fld(1, tp.T_STRUCT, self._op_struct(op))
            + _fld(2, tp.T_I32, _i32(0))  # FETCH_NEXT
            + _fld(3, tp.T_I64, _i64(max_rows))
            + _stop()
        )
        resp = self._call("FetchResults", req)
        status = resp[0]
        info = status[1] if len(status) > 1 and isinstance(status[1], list) else []
        # record the status BEFORE any raise: a caller that catches
        # the error and inspects last_fetch_status (the documented
        # truncation-detection channel) must not read the previous
        # fetch's stale SUCCESS tuple
        self.last_fetch_status = (
            status[0],
            [m.decode() if isinstance(m, bytes) else str(m) for m in info],
        )
        if status[0] == ERROR:
            # invalid/closed handle or --strict-truncation refusal —
            # surface it like HiveStatement's SQLException, never as
            # an empty result set
            msg = status[4] if len(status) > 4 else status
            raise RuntimeError(f"FetchResults failed: {msg}")
        has_more = bool(resp[1])
        rowset = resp[2]
        trows = rowset[1]
        rows = []
        for tr in trows:
            vals = []
            for cv in tr[0]:
                # union: the single set wrapper's field 1 (or None)
                wrapper = next((w for w in cv if w is not None), None)
                vals.append(None if wrapper is None or not wrapper else wrapper[0])
            rows.append(tuple(vals))
        if not rows and len(rowset) > 2 and rowset[2]:
            # column-based (V6+): field 3 list<TColumn>; per column a
            # wrapper [values, nulls-bitmask]
            cols = []
            for cv in rowset[2]:
                wrapper = next((w for w in cv if w is not None), None)
                values, nulls = wrapper[0], wrapper[1]
                nb = nulls if isinstance(nulls, bytes) else nulls.encode("latin-1")
                cols.append([
                    None if nb[i // 8] & (1 << (i % 8)) else v
                    for i, v in enumerate(values)
                ])
            rows = [tuple(c[i] for c in cols) for i in range(len(cols[0]))] if cols else []
        return rows, has_more

    def close(self) -> None:
        if self.session is not None:
            req = _fld(1, tp.T_STRUCT, self._handle_struct(self.session)) + _stop()
            self._call("CloseSession", req)
        self.sock.close()

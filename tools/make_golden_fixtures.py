#!/usr/bin/env python3
"""Golden pgoutput conformance fixture generator.

Assembles pgoutput frames byte-by-byte from the PostgreSQL documentation
("Logical Replication Message Formats") INDEPENDENTLY of the Scala
PgOutputEncoder, with the FULL real-server frame bodies — BEGIN carries
(final LSN, timestamp, xid), COMMIT carries (flags, lsn, end-lsn, ts),
TYPE/ORIGIN have their documented payloads — which the test encoder
never emits (it writes bodyless B/C). A decoder that accidentally read
past the tag byte would pass the encoder round-trip and fail here.

Output: src/test/resources/golden_pgoutput.bin in the FrameFile layout
(big-endian int64 lsn, int32 len, payload). Deterministic; rerunning
reproduces the identical file.
"""
import struct
import sys

def cstr(s):
    return s.encode("utf-8") + b"\x00"

def i8(v):
    return struct.pack(">b", v)

def i16(v):
    return struct.pack(">h", v)

def i32(v):
    return struct.pack(">i", v)

def i64(v):
    return struct.pack(">q", v)

PG_EPOCH_TS = 789782400000000  # 2025-01-11 00:00:00 in µs since 2000-01-01

def relation(relid, ns, name, cols, replident=b"d"):
    body = i32(relid) + cstr(ns) + cstr(name) + replident + i16(len(cols))
    for flags, cname, typoid, typmod in cols:
        body += i8(flags) + cstr(cname) + i32(typoid) + i32(typmod)
    return b"R" + body

def begin(final_lsn, xid):
    return b"B" + i64(final_lsn) + i64(PG_EPOCH_TS) + i32(xid)

def commit(lsn, end_lsn):
    return b"C" + i8(0) + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS)

def tuple_data(cells):
    # cells: list of ("t", text) | ("n",) | ("u",)
    body = i16(len(cells))
    for c in cells:
        if c[0] == "t":
            enc = c[1].encode("utf-8")
            body += b"t" + i32(len(enc)) + enc
        elif c[0] == "n":
            body += b"n"
        else:
            body += b"u"
    return body

def insert(relid, cells):
    return b"I" + i32(relid) + b"N" + tuple_data(cells)

def update(relid, new_cells, old=None):
    body = i32(relid)
    if old is not None:
        kind, old_cells = old
        body += kind + tuple_data(old_cells)
    return b"U" + body + b"N" + tuple_data(new_cells)

def delete(relid, kind, cells):
    return b"D" + i32(relid) + kind + tuple_data(cells)

def truncate(relids, opts):
    return b"T" + i32(len(relids)) + i8(opts) + b"".join(i32(r) for r in relids)

def type_msg(typoid, ns, name):
    return b"Y" + i32(typoid) + cstr(ns) + cstr(name)

def origin(lsn, name):
    return b"O" + i64(lsn) + cstr(name)

def stream_start(xid, first):
    return b"S" + i32(xid) + i8(1 if first else 0)

def stream_stop():
    return b"E"

def stream_commit(xid, lsn, end_lsn):
    return b"c" + i32(xid) + i8(0) + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS)

def stream_abort(xid, subxid):
    return b"A" + i32(xid) + i32(subxid)

def streamed(xid, inner):
    return inner[:1] + i32(xid) + inner[1:]

def message(prefix, content, transactional, lsn):
    return (b"M" + i8(1 if transactional else 0) + i64(lsn)
            + cstr(prefix) + i32(len(content)) + content)

# proto_version=3 two-phase commit (PG 15+), layouts per the docs
def begin_prepare(lsn, end_lsn, xid, gid):
    return b"b" + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS) + i32(xid) + cstr(gid)

def prepare(lsn, end_lsn, xid, gid):
    return b"P" + i8(0) + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS) + i32(xid) + cstr(gid)

def commit_prepared(lsn, end_lsn, xid, gid):
    return b"K" + i8(0) + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS) + i32(xid) + cstr(gid)

def rollback_prepared(pe, re_, xid, gid):
    return (b"r" + i8(0) + i64(pe) + i64(re_) + i64(PG_EPOCH_TS)
            + i64(PG_EPOCH_TS) + i32(xid) + cstr(gid))

def stream_prepare(lsn, end_lsn, xid, gid):
    return b"p" + i8(0) + i64(lsn) + i64(end_lsn) + i64(PG_EPOCH_TS) + i32(xid) + cstr(gid)


NUMERIC_10_2 = ((10 << 16) | 2) + 4

frames = [
    # multi-relation schema
    relation(5001, "public", "widgets", [
        (1, "id", 20, -1),            # int8, key
        (0, "price", 1700, NUMERIC_10_2),  # numeric(10,2)
        (0, "tags", 1009, -1),        # text[]
        (0, "note", 25, -1),          # text
        (0, "flag", 16, -1),          # bool
    ]),
    relation(5002, "public", "gadgets", [
        (1, "id", 20, -1),
        (0, "payload", 25, -1),
    ]),
    # dropped-but-recognized catalog messages, real bodies
    type_msg(600001, "public", "mood"),
    origin(0x0100_0000, "origin_node_1"),
    # one transaction touching BOTH relations (multi-relation txn):
    begin(0x0100_0100, 1234),
    insert(5001, [("t", "1"), ("t", "19.99"),
                  ("t", '{"a b","c\\"d","e\\\\f"}'), ("t", "hello"), ("t", "t")]),
    insert(5002, [("t", "7"), ("t", "B" * 64)]),
    # TOASTed payload: UPDATE ships 'u' for the unchanged big column
    update(5002, [("t", "7"), ("u",)], old=(b"O", [("t", "7"), ("t", "B" * 64)])),
    # DELETE with key-only tuple ('K'): non-key columns ride as NULL
    delete(5002, b"K", [("t", "7"), ("n",)]),
    commit(0x0100_0100, 0x0100_0101),
    # proto v2: two interleaved streamed transactions, one aborts
    stream_start(999, True),
    streamed(999, insert(5001, [("t", "2"), ("t", "0.01"), ("t", "{}"),
                                ("n",), ("t", "f")])),
    stream_stop(),
    stream_start(1001, True),
    streamed(1001, insert(5001, [("t", "3"), ("t", "1.00"), ("t", "{}"),
                                 ("n",), ("t", "t")])),
    stream_stop(),
    stream_commit(999, 0x0100_0200, 0x0100_0201),
    stream_abort(1001, 1001),
    # truncate both relations (CASCADE), inside its own txn
    begin(0x0100_0300, 1300),
    truncate([5001, 5002], 1),
    commit(0x0100_0300, 0x0100_0301),
    # logical decoding messages (pg_logical_emit_message): transactional
    # inside a txn, non-transactional standalone, streamed-then-aborted
    # (must be discarded); content is raw bytes incl. NUL and 0xff
    begin(0x0100_0400, 1400),
    message("golden.fence", b"\x00\xff\x7f seq=1", True, 0x0100_0410),
    commit(0x0100_0400, 0x0100_0401),
    message("golden.tick", b"", False, 0x0100_0500),
    stream_start(1500, True),
    streamed(1500, message("golden.doomed", b"zz", True, 0x0100_0600)),
    stream_stop(),
    stream_abort(1500, 1500),
    # bytea column: hex wire format (server default since 9.0)
    relation(5003, "public", "blobs", [
        (1, "id", 20, -1),
        (0, "data", 17, -1),          # bytea
    ]),
    begin(0x0100_0700, 1700),
    insert(5003, [("t", "1"), ("t", "\\x00ff10ab")]),
    insert(5003, [("t", "2"), ("n",)]),
    commit(0x0100_0700, 0x0100_0701),
    # bytea LEGACY escape format (bytea_output=escape, pre-9.0 default):
    # bytes [0x00, 0x5c, 0x41, 0xff] -> "\000" + doubled backslash + "A"
    # + "\377" (printables verbatim, backslash doubled, rest 3-digit octal)
    begin(0x0100_0800, 1800),
    insert(5003, [("t", "3"), ("t", "\\000\\\\A\\377")]),
    commit(0x0100_0800, 0x0100_0801),
    # proto v3 two-phase commit: one prepared tx commits, one rolls
    # back, and an ordinary v1 tx interleaves INSIDE the undecided
    # window (PG serializes per-tx at prepare/commit time, so a decided
    # tx can land between another's PREPARE and COMMIT PREPARED)
    begin_prepare(0x0100_0900, 0x0100_0901, 2100, "golden-gid-commit"),
    insert(5001, [("t", "10"), ("t", "5.00"), ("t", "{}"), ("n",), ("t", "t")]),
    prepare(0x0100_0900, 0x0100_0901, 2100, "golden-gid-commit"),
    begin_prepare(0x0100_0A00, 0x0100_0A01, 2200, "golden-gid-abort"),
    insert(5001, [("t", "11"), ("t", "6.00"), ("t", "{}"), ("n",), ("t", "f")]),
    prepare(0x0100_0A00, 0x0100_0A01, 2200, "golden-gid-abort"),
    begin(0x0100_0B00, 2300),
    insert(5003, [("t", "4"), ("t", "\\x0a0b")]),
    commit(0x0100_0B00, 0x0100_0B01),
    commit_prepared(0x0100_0900, 0x0100_0902, 2100, "golden-gid-commit"),
    rollback_prepared(0x0100_0A01, 0x0100_0A02, 2200, "golden-gid-abort"),
    # a STREAMED tx that prepares ('p' ends its segments) then commits
    stream_start(2400, True),
    streamed(2400, insert(5001, [("t", "12"), ("t", "7.00"), ("t", "{}"),
                                 ("n",), ("t", "t")])),
    stream_stop(),
    stream_prepare(0x0100_0C00, 0x0100_0C01, 2400, "golden-gid-stream"),
    commit_prepared(0x0100_0C00, 0x0100_0C02, 2400, "golden-gid-stream"),
]

out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/golden_pgoutput.bin"
with open(out, "wb") as f:
    for idx, frame in enumerate(frames):
        f.write(i64(1000 + idx) + i32(len(frame)) + frame)
print(f"wrote {len(frames)} frames to {out}")

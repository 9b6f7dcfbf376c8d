#!/usr/bin/env python3
"""Independent golden-bytes generator for the factstore-v1 wire protocol.

protoc is unavailable offline, so this is the second, independent protobuf
implementation the hand-rolled Scala codec (server/grpc/Pb.scala) is checked
against: ~40 lines of encoder written directly from the public protobuf wire
format (varint tags `(field_number << 3) | wire_type`, wire type 0 = varint,
2 = length-delimited) and the field numbers in
/root/reference/factstore-proto/factstore-v1.proto. It shares no code or
structure with the Scala side. Output: src/test/resources/proto_golden.json
(name -> hex), consumed by PbGoldenSpec.

Encoding conventions (canonical proto3, matching protoc):
  - implicit-presence scalars (plain string/int) are omitted when zero/empty
  - explicit-presence fields (`optional`, oneof members) are always written
  - map<string,string> entries are one nested message per pair (key=1,
    value=2); entries sorted by key for deterministic bytes
Fixtures deliberately use non-default values everywhere except where a
default is the point, so implicit-vs-explicit presence differences between
encoders cannot hide.
"""
import json
import os


def varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement, 10 bytes — per the spec
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(fn: int, wire: int) -> bytes:
    return varint((fn << 3) | wire)


def ld(fn: int, payload: bytes) -> bytes:  # length-delimited
    return tag(fn, 2) + varint(len(payload)) + payload


def s(fn: int, text: str, always: bool = False) -> bytes:
    b = text.encode("utf-8")
    return ld(fn, b) if (b or always) else b""


def i(fn: int, v: int, always: bool = False) -> bytes:
    return (tag(fn, 0) + varint(v)) if (v or always) else b""


def msg(fn: int, *parts: bytes) -> bytes:
    return ld(fn, b"".join(parts))


def smap(fn: int, m: dict) -> bytes:
    return b"".join(msg(fn, s(1, k), s(2, v, always=True)) for k, v in sorted(m.items()))


def ts(seconds: int, nanos: int) -> bytes:  # google.protobuf.Timestamp
    return i(1, seconds) + i(2, nanos)


# --- shared fixture values (mirrored in PbGoldenSpec.scala) -------------------
STORE_ID = "11111111-2222-3333-4444-555555555555"
T0_S, T0_N = 1700000000, 123456789


def fact_body() -> bytes:  # the representative Fact: every field populated
    return (
        s(1, "f-1") + s(2, "ORDER_PLACED") + s(3, "order/1")
        + msg(4, ts(1700000002, 42))
        + msg(5, ld(1, b'{"total":42}') + s(2, "json", always=True) + s(3, "s1", always=True))
        + smap(6, {"m": "1"})
        + smap(7, {"a": "x", "b": "y"})
    )


def store_info(id_: str, name: str) -> bytes:
    return s(1, id_) + s(2, name) + msg(3, ts(T0_S, T0_N))


golden = {
    # --- InfoService ---------------------------------------------------------
    "server_info": (s(1, "graft") + s(2, "0.1.0") + s(3, "spark-parquet-log")).hex(),

    # --- StoreService responses ---------------------------------------------
    "create_store_created": msg(1, s(1, STORE_ID)).hex(),
    "create_store_name_exists": msg(2).hex(),
    "get_store_found": msg(1, msg(1, store_info("id-1", "orders"))).hex(),
    "get_store_not_found": msg(2, s(1, "orders")).hex(),
    "list_stores": (msg(1, store_info("id-1", "orders"))
                    + msg(1, store_info("id-2", "parts"))).hex(),
    "delete_store_deleted": msg(1).hex(),
    "store_exists_present": msg(1).hex(),
    "store_exists_absent": msg(2).hex(),

    # --- FactService responses ----------------------------------------------
    "append_appended": msg(1, s(1, "f1") + s(1, "f2") + msg(2, ts(1700000001, 5))).hex(),
    "append_already_applied": msg(2).hex(),
    "append_condition_violated": msg(3).hex(),
    "append_store_not_found": msg(4).hex(),
    "get_fact_found": msg(1, msg(1, fact_body())).hex(),
    "get_fact_not_found": msg(2).hex(),
    "fact_exists_present": msg(1).hex(),
    "find_found": msg(1, msg(1, fact_body())).hex(),
    "find_store_not_found": msg(2, s(1, "orders")).hex(),
    "stream_batch": msg(1, msg(1, fact_body())).hex(),
    "stream_store_not_found": msg(2, s(1, "orders")).hex(),
    "stream_after_fact_not_found": msg(3).hex(),

    # --- FactService requests (parsed by the Scala codec) --------------------
    "append_request": (
        s(1, "orders")
        + msg(2,  # FactInput
              s(1, "T") + s(2, "s")
              + msg(3, ld(1, b"\x01\x02") + s(2, "json", always=True))
              + smap(5, {"k": "v"}))
        + s(3, "key-1", always=True)
        + msg(4,  # AppendCondition: all = 3
              msg(3,
                  msg(1, msg(1, s(1, "s") + s(2, "e-1", always=True)))  # expected_last_fact
                  + msg(1, msg(2,  # tag_query_based
                        msg(1,  # TagQuery
                            msg(1, msg(1, smap(1, {"k": "v"})))  # item: tag_only
                            + msg(1, msg(2, s(1, "A") + s(1, "B")  # item: tag_type
                                         + smap(2, {"t": "u"}))))
                        + s(2, "a-1", always=True)))))
    ).hex(),
    "by_subject_request": (s(1, "orders") + s(2, "order/1")
                           + i(3, 5, always=True) + i(4, 1)).hex(),
    "by_tags_request": (s(1, "orders") + smap(2, {"k": "v"})).hex(),
    "query_facts_request": (
        s(1, "orders")
        + msg(2,
              msg(1, msg(1, smap(1, {"k": "v"})))
              + msg(1, msg(2, s(1, "A") + smap(2, {"t": "u"}))))
    ).hex(),
    "time_range_request": (
        s(1, "orders") + msg(2, ts(1700000000, 0)) + msg(3, ts(1700000100, 0))
        + i(4, 7, always=True) + i(5, 1)
    ).hex(),
    "subscribe_from_beginning": (s(1, "orders") + msg(2)).hex(),
    "subscribe_from_end": (s(1, "orders") + msg(3)).hex(),
    "subscribe_after": (s(1, "orders") + s(4, "f-9", always=True)).hex(),
    "replay_from_beginning": (s(1, "orders") + msg(2)).hex(),
    "replay_after": (s(1, "orders") + s(3, "f-7", always=True)).hex(),
}

out = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "proto_golden.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(golden, f, indent=2, sort_keys=True)
print(f"wrote {len(golden)} fixtures to {out}")

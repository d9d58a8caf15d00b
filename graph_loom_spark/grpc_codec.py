"""Hand-rolled proto3 wire codec for the GraphQuery contract
(proto/graph_loom.proto — same field numbers/types as the reference's
proto/graph_loom.proto:1-43).

Why hand-rolled: the serving layer must not require protoc/grpcio-tools
at build time. These encoders/decoders implement exactly the handful of
proto3 features the contract uses — varints, length-delimited fields,
``map<string,string>`` (repeated key/value submessages), and the
``oneof`` row item — and are unit-tested against the spec independently
of grpcio (grpc_serve.py plugs them into grpcio's generic handlers as
request_deserializer / response_serializer when grpcio is present).

Messages are represented as plain dicts:

- request:  ``{"query": str, "params": {str: str}, "log": bool}``
- response: ``{"rows": [row], "affected_nodes": int,
  "affected_relationships": int, "mutated": bool, "error": str}``
- row (oneof): exactly one of
  ``{"node": {"id", "label", "metadata"}}``,
  ``{"relationship": {"id", "from_id", "to_id", "label", "metadata"}}``,
  ``{"info": str}``.
"""

from __future__ import annotations

# ---------------------------------------------------------------- varint


def _varint(n: int) -> bytes:
    if n < 0:
        # proto int64 would need 10-byte two's-complement; this schema
        # only carries counts/bools/lengths, so negatives are a caller
        # bug — fail fast instead of looping forever on n >>= 7
        raise ValueError(f"negative varint: {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field: int, s: str) -> bytes:
    """proto3 scalar: empty string is omitted."""
    return _len_field(field, s.encode()) if s else b""


def _varint_field(field: int, n: int) -> bytes:
    """proto3 scalar: zero/false is omitted."""
    return _tag(field, 0) + _varint(n) if n else b""


def _map_entries(field: int, mapping: dict[str, str]) -> bytes:
    """map<string,string> = repeated {1: key, 2: value} submessages."""
    out = bytearray()
    for k, v in mapping.items():
        entry = _str_field(1, k) + _str_field(2, v)
        out += _len_field(field, entry)
    return bytes(out)


def _iter_fields(data: bytes):
    """Yield (field_number, wire_type, value) — value is int for varint,
    bytes for length-delimited. Unknown wire types are skipped per spec."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = _read_varint(data, pos)
        field, wt = key >> 3, key & 0x07
        if wt == 0:
            val, pos = _read_varint(data, pos)
            yield field, wt, val
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            yield field, wt, data[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit, not used by this schema but skip cleanly
            pos += 4
        elif wt == 1:  # 64-bit
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _decode_map_entry(data: bytes) -> tuple[str, str]:
    k = v = ""
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == 2:
            k = val.decode()
        elif field == 2 and wt == 2:
            v = val.decode()
    return k, v


# ------------------------------------------------------------ QueryRequest


def encode_query_request(query: str, params: dict[str, str] | None = None, log: bool = False) -> bytes:
    return (
        _str_field(1, query)
        + _map_entries(2, params or {})
        + _varint_field(3, 1 if log else 0)
    )


def decode_query_request(data: bytes) -> dict:
    query, params, log = "", {}, False
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == 2:
            query = val.decode()
        elif field == 2 and wt == 2:
            k, v = _decode_map_entry(val)
            params[k] = v
        elif field == 3 and wt == 0:
            log = bool(val)
    return {"query": query, "params": params, "log": log}


# --------------------------------------------------------------- QueryRow


def _encode_node(n: dict) -> bytes:
    return (
        _str_field(1, n.get("id", ""))
        + _str_field(2, n.get("label", ""))
        + _map_entries(3, n.get("metadata") or {})
    )


def _decode_node(data: bytes) -> dict:
    out = {"id": "", "label": "", "metadata": {}}
    for field, wt, val in _iter_fields(data):
        if field == 1:
            out["id"] = val.decode()
        elif field == 2:
            out["label"] = val.decode()
        elif field == 3:
            k, v = _decode_map_entry(val)
            out["metadata"][k] = v
    return out


def _encode_relationship(r: dict) -> bytes:
    return (
        _str_field(1, r.get("id", ""))
        + _str_field(2, r.get("from_id", ""))
        + _str_field(3, r.get("to_id", ""))
        + _str_field(4, r.get("label", ""))
        + _map_entries(5, r.get("metadata") or {})
    )


def _decode_relationship(data: bytes) -> dict:
    out = {"id": "", "from_id": "", "to_id": "", "label": "", "metadata": {}}
    names = {1: "id", 2: "from_id", 3: "to_id", 4: "label"}
    for field, wt, val in _iter_fields(data):
        if field in names:
            out[names[field]] = val.decode()
        elif field == 5:
            k, v = _decode_map_entry(val)
            out["metadata"][k] = v
    return out


def _encode_row(row: dict) -> bytes:
    # oneof: exactly one branch on the wire. A oneof member is always
    # emitted when set, even if empty (unlike plain proto3 scalars), so
    # info uses _len_field directly.
    if "node" in row:
        return _len_field(1, _encode_node(row["node"]))
    if "relationship" in row:
        return _len_field(2, _encode_relationship(row["relationship"]))
    return _len_field(3, row.get("info", "").encode())


def _decode_row(data: bytes) -> dict:
    for field, wt, val in _iter_fields(data):
        if field == 1:
            return {"node": _decode_node(val)}
        if field == 2:
            return {"relationship": _decode_relationship(val)}
        if field == 3:
            return {"info": val.decode()}
    return {}


# ------------------------------------------------------------ QueryResponse


def encode_query_response(resp: dict) -> bytes:
    out = bytearray()
    for row in resp.get("rows", []):
        out += _len_field(1, _encode_row(row))
    out += _varint_field(2, int(resp.get("affected_nodes", 0)))
    out += _varint_field(3, int(resp.get("affected_relationships", 0)))
    out += _varint_field(4, 1 if resp.get("mutated") else 0)
    out += _str_field(5, resp.get("error", ""))
    return bytes(out)


def decode_query_response(data: bytes) -> dict:
    resp = {
        "rows": [],
        "affected_nodes": 0,
        "affected_relationships": 0,
        "mutated": False,
        "error": "",
    }
    for field, wt, val in _iter_fields(data):
        if field == 1:
            resp["rows"].append(_decode_row(val))
        elif field == 2:
            resp["affected_nodes"] = val
        elif field == 3:
            resp["affected_relationships"] = val
        elif field == 4:
            resp["mutated"] = bool(val)
        elif field == 5:
            resp["error"] = val.decode()
    return resp

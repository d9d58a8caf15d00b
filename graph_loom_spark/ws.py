"""Minimal RFC 6455 WebSocket protocol — stdlib only.

Backs the V2 WebSocket REPL (reference src/api/server.rs:179-230) and
the glsh client (src/bin/glsh.rs connects over WS). The container ships
no websocket library, and the protocol needed here is small: HTTP/1.1
upgrade handshake, text/ping/pong/close frames, client-side masking.
No extensions (permessage-deflate etc.), no wss.

Server side is used from inside a ``BaseHTTPRequestHandler`` (the
handler hands over its socket after the 101 response); client side is a
tiny blocking socket wrapper for glsh and tests.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(sec_websocket_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key."""
    digest = hashlib.sha1((sec_websocket_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes, mask: bool = False) -> bytes:
    """One unfragmented frame (FIN=1). Servers send unmasked, clients
    MUST mask (RFC 6455 §5.3)."""
    head = bytearray([0x80 | (opcode & 0x0F)])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def _read_exact(rfile, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


# One declared frame length beyond this aborts the connection before
# any payload is buffered — a client could otherwise declare an 8 GB
# frame and drive the serving thread into unbounded allocation.
MAX_FRAME_BYTES = 16 * 1024 * 1024


def read_frame(rfile) -> tuple[int, bool, bytes]:
    """Read one frame → (opcode, fin, unmasked payload)."""
    b0, b1 = _read_exact(rfile, 2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", _read_exact(rfile, 2))
    elif n == 127:
        (n,) = struct.unpack(">Q", _read_exact(rfile, 8))
    if n > MAX_FRAME_BYTES:
        raise ConnectionError(f"websocket frame too large ({n} bytes)")
    key = _read_exact(rfile, 4) if masked else None
    payload = _read_exact(rfile, n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


def read_message(rfile) -> tuple[int, bytes]:
    """Read one complete message, reassembling continuation frames.
    Control frames interleaved inside a fragmented message are returned
    as-is by the caller loop — here we only stitch data frames."""
    opcode, fin, payload = read_frame(rfile)
    if opcode in (OP_CLOSE, OP_PING, OP_PONG) or fin:
        return opcode, payload
    parts = [payload]
    first_op = opcode
    while True:
        opcode, fin, payload = read_frame(rfile)
        if opcode in (OP_CLOSE, OP_PING, OP_PONG):
            # control frame mid-fragmentation: surface it immediately;
            # the REPL protocol never fragments its own replies so
            # dropping the partial data here is acceptable for a REPL
            return opcode, payload
        parts.append(payload)
        if fin:
            return first_op, b"".join(parts)


class WebSocketClient:
    """Blocking client for tests and glsh: connect → recv banner →
    send(query) → recv(reply)."""

    def __init__(
        self,
        host: str,
        port: int,
        path: str = "/api/repl",
        api_key: str | None = None,
        timeout: float = 65.0,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.rfile = self.sock.makefile("rb")
        key = base64.b64encode(os.urandom(16)).decode()
        headers = [
            f"GET {path} HTTP/1.1",
            f"Host: {host}:{port}",
            "Upgrade: websocket",
            "Connection: Upgrade",
            f"Sec-WebSocket-Key: {key}",
            "Sec-WebSocket-Version: 13",
        ]
        if api_key:
            headers.append(f"X-API-Key: {api_key}")
        self.sock.sendall(("\r\n".join(headers) + "\r\n\r\n").encode())
        status = self.rfile.readline().decode("latin-1")
        resp_headers: dict[str, str] = {}
        while True:
            line = self.rfile.readline().decode("latin-1").strip()
            if not line:
                break
            k, _, v = line.partition(":")
            resp_headers[k.strip().lower()] = v.strip()
        if " 101 " not in status and not status.rstrip().endswith(" 101"):
            raise ConnectionError(f"websocket upgrade refused: {status.strip()}")
        expect = accept_key(key)
        if resp_headers.get("sec-websocket-accept") != expect:
            raise ConnectionError("bad Sec-WebSocket-Accept from server")

    def send_text(self, text: str) -> None:
        self.sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def recv_text(self) -> str:
        """Next text message; answers pings transparently."""
        while True:
            opcode, payload = read_message(self.rfile)
            if opcode == OP_TEXT:
                return payload.decode()
            if opcode == OP_PING:
                self.sock.sendall(encode_frame(OP_PONG, payload, mask=True))
                continue
            if opcode == OP_CLOSE:
                raise ConnectionError("server closed the websocket")
            # ignore pongs / binary

    def close(self) -> None:
        try:
            self.sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
        except OSError:
            pass
        try:
            self.rfile.close()
        finally:
            self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""Voice client: the chat_loc layer.

Rebuild of reference nav_agent/sem_nav_ctr/.../chat_loc_python/drobotc_g1.py:43-403
(WebSocket audio client: PCM capture/playback chunks, resampling, heartbeat,
control queue) and node_chat_loc_class.py:44-123 (parsed server text published
to the goal layer, waypoint feedback sent back).  Self-contained: RFC 6455
framing and the HTTP upgrade handshake are implemented here (this image ships
no websocket library), audio IO is injected (no pyaudio) — the robot supplies
capture/playback callables, tests drive PCM arrays directly.

Message protocol (JSON text frames, mirroring the reference's server chat):
  server -> client: {"type": "text",   "text": ...}   voice command transcript
                    {"type": "signal", "value": ...}  control words (stop/tour)
                    {"type": "qa",     "text": ...}   chat answer to speak
  client -> server: {"type": "audio",  "pcm": base64 int16 mono}
                    {"type": "waypoint_reached", "value": ...}
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import queue
import socket
import struct
import threading
from typing import Callable, Optional

import numpy as np

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


# ---------------------------------------------------------------------------
# PCM helpers (reference drobotc resamples device-rate PCM to 16 kHz mono)
# ---------------------------------------------------------------------------


def pcm_float_to_int16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(x, np.float32) * 32767.0, -32768, 32767).astype(np.int16)


def pcm_int16_to_float(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, np.int16).astype(np.float32) / 32767.0


def resample_linear(pcm: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resampler (mono float PCM)."""
    if rate_in == rate_out or len(pcm) == 0:
        return np.asarray(pcm, np.float32)
    n_out = max(1, int(round(len(pcm) * rate_out / rate_in)))
    t_out = np.linspace(0.0, len(pcm) - 1.0, n_out)
    return np.interp(t_out, np.arange(len(pcm)), np.asarray(pcm, np.float32)).astype(
        np.float32
    )


def encode_pcm_b64(pcm_f32: np.ndarray) -> str:
    return base64.b64encode(pcm_float_to_int16(pcm_f32).tobytes()).decode()


def decode_pcm_b64(s: str) -> np.ndarray:
    return pcm_int16_to_float(np.frombuffer(base64.b64decode(s), np.int16))


# ---------------------------------------------------------------------------
# RFC 6455 framing
# ---------------------------------------------------------------------------

OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0x1, 0x2, 0x8, 0x9, 0xA


def _mask_bytes(payload: bytes, key: bytes) -> bytes:
    """Vectorized XOR mask (a per-byte Python loop would burn the single host
    core at streaming-audio rates)."""
    a = np.frombuffer(payload, np.uint8)
    k = np.resize(np.frombuffer(key, np.uint8), len(a))
    return (a ^ k).tobytes()


def ws_encode(payload: bytes, opcode: int = OP_TEXT, mask: bool = True) -> bytes:
    head = bytes([0x80 | opcode])
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mbit | n])
    elif n < 1 << 16:
        head += bytes([mbit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mbit | 127]) + struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        return head + key + _mask_bytes(payload, key)
    return head + payload


class WsConn:
    """Framing layer over a connected socket: buffered reads (bytes received
    past the handshake terminator are NOT lost), frame decode, and
    fragmented-message reassembly (FIN/continuation, RFC 6455 §5.4)."""

    def __init__(self, sock: socket.socket, leftover: bytes = b""):
        self.sock = sock
        self._buf = leftover

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(max(4096, n - len(self._buf)))
            if not chunk:
                raise ConnectionError("socket closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_frame(self):
        """One raw frame -> (fin, opcode, payload)."""
        b0, b1 = self.read_exact(2)
        fin = bool(b0 & 0x80)
        opcode = b0 & 0x0F
        masked = bool(b1 & 0x80)
        n = b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self.read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self.read_exact(8))
        key = self.read_exact(4) if masked else None
        payload = self.read_exact(n)
        if key:
            payload = _mask_bytes(payload, key)
        return fin, opcode, payload

    def read_message(self):
        """One complete message -> (opcode, payload), reassembling
        continuation frames; control frames (ping/pong/close) are returned
        immediately even mid-fragmentation."""
        op_acc = None
        acc = b""
        while True:
            fin, opcode, payload = self.read_frame()
            if opcode in (OP_CLOSE, OP_PING, OP_PONG):
                return opcode, payload
            if opcode != 0:  # first (or only) fragment
                op_acc, acc = opcode, payload
            else:  # continuation
                acc += payload
            if fin:
                return (op_acc if op_acc is not None else OP_TEXT), acc


def ws_client_handshake(sock: socket.socket, host: str, path: str = "/") -> WsConn:
    key = base64.b64encode(os.urandom(16)).decode()
    req = (
        f"GET {path} HTTP/1.1\r\nHost: {host}\r\nUpgrade: websocket\r\n"
        f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(req.encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("handshake failed")
        resp += chunk
    head, _, leftover = resp.partition(b"\r\n\r\n")
    if b"101" not in head.split(b"\r\n", 1)[0]:
        raise ConnectionError(f"bad upgrade response: {head[:80]!r}")
    expect = base64.b64encode(
        hashlib.sha1((key + _WS_MAGIC).encode()).digest()
    ).decode()
    if expect.encode() not in head:
        raise ConnectionError("Sec-WebSocket-Accept mismatch")
    return WsConn(sock, leftover)


def ws_server_handshake(conn: socket.socket) -> WsConn:
    req = b""
    while b"\r\n\r\n" not in req:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("client went away")
        req += chunk
    head, _, leftover = req.partition(b"\r\n\r\n")
    key = ""
    for line in head.decode(errors="replace").split("\r\n"):
        if line.lower().startswith("sec-websocket-key:"):
            key = line.split(":", 1)[1].strip()
    accept = base64.b64encode(hashlib.sha1((key + _WS_MAGIC).encode()).digest()).decode()
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )
    return WsConn(conn, leftover)


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class VoiceClient:
    """Connects to the voice server, streams audio up, dispatches parsed text.

    Callbacks (any may be None):
      on_text(str)    — navigation instruction transcript (-> GoalService)
      on_signal(str)  — control words ("stop", tour trigger, ...)
      on_qa(str)      — chat answers; robot side feeds these to playback
    """

    def __init__(
        self,
        host: str,
        port: int,
        on_text: Optional[Callable[[str], None]] = None,
        on_signal: Optional[Callable[[str], None]] = None,
        on_qa: Optional[Callable[[str], None]] = None,
        capture_rate: int = 48000,
        server_rate: int = 16000,
        heartbeat_s: float = 5.0,
    ):
        self.on_text = on_text
        self.on_signal = on_signal
        self.on_qa = on_qa
        self.capture_rate = capture_rate
        self.server_rate = server_rate
        self.heartbeat_s = heartbeat_s
        self._send_q: "queue.Queue[Optional[bytes]]" = queue.Queue()
        self._sock = socket.create_connection((host, port))
        self._conn = ws_client_handshake(self._sock, f"{host}:{port}")
        self._alive = True
        self._rx = threading.Thread(target=self._recv_loop, daemon=True)
        self._tx = threading.Thread(target=self._send_loop, daemon=True)
        self._hb = threading.Thread(target=self._heartbeat_loop, daemon=True)
        self._rx.start()
        self._tx.start()
        self._hb.start()

    # -------------------------------------------------------------- sending

    def send_audio(self, pcm: np.ndarray) -> None:
        """Queue one captured chunk (float mono at capture_rate)."""
        pcm16k = resample_linear(pcm, self.capture_rate, self.server_rate)
        msg = json.dumps({"type": "audio", "pcm": encode_pcm_b64(pcm16k)})
        self._send_q.put(ws_encode(msg.encode(), OP_TEXT))

    def notify_waypoint_reached(self, value: str = "1") -> None:
        """Mirror of node_chat_loc's waypoint_reached feedback to the server."""
        msg = json.dumps({"type": "waypoint_reached", "value": value})
        self._send_q.put(ws_encode(msg.encode(), OP_TEXT))

    def close(self) -> None:
        if self._alive:
            self._alive = False
            try:
                self._send_q.put(ws_encode(b"", OP_CLOSE))
                self._send_q.put(None)
                self._tx.join(timeout=2)
            finally:
                try:
                    self._sock.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                self._sock.close()

    # -------------------------------------------------------------- threads

    def _send_loop(self) -> None:
        while True:
            item = self._send_q.get()
            if item is None:
                return
            try:
                self._sock.sendall(item)
            except OSError:
                return

    def _heartbeat_loop(self) -> None:
        import time

        while self._alive:
            time.sleep(self.heartbeat_s)
            if self._alive:
                self._send_q.put(ws_encode(b"hb", OP_PING))

    def _recv_loop(self) -> None:
        try:
            while self._alive:
                opcode, payload = self._conn.read_message()
                if opcode == OP_PING:
                    self._send_q.put(ws_encode(payload, OP_PONG))
                elif opcode == OP_CLOSE:
                    break
                elif opcode == OP_TEXT:
                    self._dispatch(payload)
        except (ConnectionError, OSError):
            pass
        finally:
            self._alive = False

    def _dispatch(self, payload: bytes) -> None:
        try:
            msg = json.loads(payload.decode())
        except (ValueError, UnicodeDecodeError):
            return
        kind = msg.get("type")
        if kind == "text" and self.on_text:
            self.on_text(msg.get("text", ""))
        elif kind == "signal" and self.on_signal:
            self.on_signal(str(msg.get("value", "")))
        elif kind == "qa" and self.on_qa:
            self.on_qa(msg.get("text", ""))


# ---------------------------------------------------------------------------
# Loopback server (test fixture; the real voice server is external)
# ---------------------------------------------------------------------------


class LoopbackVoiceServer:
    """Single-connection WS server: collects audio, replies with a scripted
    transcript once enough samples arrive; echoes waypoint feedback as a
    signal.  Runs in a daemon thread on an ephemeral port."""

    def __init__(self, transcript: str = "go to the kitchen", min_samples: int = 8000):
        self.transcript = transcript
        self.min_samples = min_samples
        self.received_samples = 0
        self.waypoint_msgs = []
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        try:
            wc = ws_server_handshake(conn)
            sent = False
            while True:
                opcode, payload = wc.read_message()
                if opcode == OP_CLOSE:
                    break
                if opcode == OP_PING:
                    conn.sendall(ws_encode(payload, OP_PONG, mask=False))
                    continue
                if opcode != OP_TEXT:
                    continue
                msg = json.loads(payload.decode())
                if msg.get("type") == "audio":
                    self.received_samples += len(decode_pcm_b64(msg["pcm"]))
                    if not sent and self.received_samples >= self.min_samples:
                        out = json.dumps({"type": "text", "text": self.transcript})
                        conn.sendall(ws_encode(out.encode(), OP_TEXT, mask=False))
                        sent = True
                elif msg.get("type") == "waypoint_reached":
                    self.waypoint_msgs.append(msg["value"])
                    out = json.dumps({"type": "signal", "value": "ack"})
                    conn.sendall(ws_encode(out.encode(), OP_TEXT, mask=False))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()
            self._srv.close()

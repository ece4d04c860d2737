"""Voice client layer: WS framing, PCM codec, loopback round trip."""

import threading
import time

import numpy as np
import pytest

from holoagent_tpu.agent.voice_client import (
    LoopbackVoiceServer,
    VoiceClient,
    decode_pcm_b64,
    encode_pcm_b64,
    pcm_float_to_int16,
    pcm_int16_to_float,
    resample_linear,
)


def test_pcm_roundtrip(rng):
    x = rng.uniform(-0.9, 0.9, 4096).astype(np.float32)
    y = pcm_int16_to_float(pcm_float_to_int16(x))
    np.testing.assert_allclose(y, x, atol=1e-4)
    z = decode_pcm_b64(encode_pcm_b64(x))
    np.testing.assert_allclose(z, x, atol=1e-4)


def test_resample_preserves_tone(rng):
    """A 440 Hz tone resampled 48k->16k keeps its frequency."""
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_linear(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 16000 / len(y)
    assert abs(peak_hz - 440) < 5


def test_voice_loopback_roundtrip(rng):
    """Audio up -> transcript down -> waypoint feedback -> signal ack."""
    server = LoopbackVoiceServer(transcript="go to the red chair", min_samples=4000)
    texts, signals = [], []
    got_text = threading.Event()
    got_signal = threading.Event()

    def on_text(t):
        texts.append(t)
        got_text.set()

    def on_signal(s):
        signals.append(s)
        got_signal.set()

    client = VoiceClient(
        "127.0.0.1", server.port, on_text=on_text, on_signal=on_signal,
        capture_rate=48000, server_rate=16000, heartbeat_s=0.2,
    )
    try:
        chunk = rng.uniform(-0.5, 0.5, 6000).astype(np.float32)
        for _ in range(3):  # 3 x 2000 samples at 16k after resample
            client.send_audio(chunk)
        assert got_text.wait(5.0), "no transcript received"
        assert texts == ["go to the red chair"]
        client.notify_waypoint_reached("1")
        assert got_signal.wait(5.0), "no signal ack received"
        assert signals == ["ack"]
        time.sleep(0.5)  # let at least one heartbeat ping/pong cycle run
        assert client._alive
        assert server.waypoint_msgs == ["1"]
    finally:
        client.close()


def test_ws_fragmented_message_and_handshake_leftover():
    """Frames sent in the same TCP segment as the handshake tail, and a
    message fragmented across FIN=0 continuation frames, must both survive."""
    import json
    import socket
    import threading

    from holoagent_tpu.agent.voice_client import (
        OP_TEXT,
        WsConn,
        ws_client_handshake,
        ws_encode,
        ws_server_handshake,
    )

    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    payload = json.dumps({"type": "text", "text": "x" * 300}).encode()

    def server():
        conn, _ = srv.accept()
        wc = ws_server_handshake(conn)
        # greeting frame immediately (may coalesce with the 101 response),
        # then a 3-fragment message: text FIN=0, cont FIN=0, cont FIN=1
        conn.sendall(ws_encode(b'{"type":"signal","value":"hello"}', OP_TEXT, mask=False))
        a, b, c = payload[:100], payload[100:200], payload[200:]
        f1 = ws_encode(a, OP_TEXT, mask=False)
        f1 = bytes([f1[0] & 0x7F]) + f1[1:]  # clear FIN
        f2 = ws_encode(b, 0x0, mask=False)
        f2 = bytes([f2[0] & 0x7F]) + f2[1:]
        f3 = ws_encode(c, 0x0, mask=False)
        conn.sendall(f1 + f2 + f3)
        # read one client frame then close
        wc.read_message()
        conn.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    sock = socket.create_connection(("127.0.0.1", port))
    wc = ws_client_handshake(sock, f"127.0.0.1:{port}")
    op1, p1 = wc.read_message()
    assert json.loads(p1)["value"] == "hello"
    op2, p2 = wc.read_message()
    assert p2 == payload and json.loads(p2)["text"] == "x" * 300
    sock.sendall(ws_encode(b'{"type":"audio","pcm":""}', OP_TEXT))
    sock.close()
    srv.close()

import io
import socket
import wave

import numpy as np
import requests

from whisperseg_tpu.services.gui import build_app


class StubSegmenter:
    def segment(self, audio, sr, **kw):
        return {"onset": [0.1], "offset": [0.2], "cluster": ["v"]}


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def wav_bytes():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(1600, dtype="<i2").tobytes())
    return buf.getvalue()


def test_gui_serves_page_and_segments():
    app = build_app("", StubSegmenter())
    port = free_port()
    app.serve("127.0.0.1", port, background=True)
    try:
        r = requests.get(f"http://127.0.0.1:{port}/")
        assert r.status_code == 200
        assert "WhisperSeg-TPU" in r.text
        assert "text/html" in r.headers["Content-Type"]

        r = requests.post(f"http://127.0.0.1:{port}/segment",
                          files={"audio_file": ("a.wav", wav_bytes())},
                          data={"num_trials": "1"})
        assert r.status_code == 200
        assert r.json() == {"onset": [0.1], "offset": [0.2], "cluster": ["v"]}
    finally:
        app.shutdown()


def test_gui_backend_mode_points_at_backend():
    app = build_app("example.com:8060")
    port = free_port()
    app.serve("127.0.0.1", port, background=True)
    try:
        r = requests.get(f"http://127.0.0.1:{port}/")
        assert 'BACKEND = "example.com:8060"' in r.text
    finally:
        app.shutdown()

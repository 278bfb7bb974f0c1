"""Web-service tests over a live stdlib HTTP server with a stubbed segmenter."""

import base64
import io
import json
import os
import socket
import wave
import zipfile

import numpy as np
import pytest
import requests

from whisperseg_tpu.services.backend import BackendState, build_app as build_backend
from whisperseg_tpu.services.post_process import post_process_marmoset
from whisperseg_tpu.services.segment_service import (
    adobe_audition_format,
    build_app as build_segment_app,
    decimal_to_seconds,
    seconds_to_decimal,
)


class StubSegmenter:
    def __init__(self, prediction=None):
        self.prediction = prediction or {
            "onset": [0.1, 3725.5], "offset": [0.5, 3726.0],
            "cluster": ["a", "b"],
        }
        self.calls = []

    def segment(self, audio, sr, **kw):
        self.calls.append({"sr": sr, "len": len(audio), **kw})
        return dict(self.prediction)


def wav_bytes(sr=16000, n=16000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.zeros(n * channels, dtype="<i2").tobytes())
    return buf.getvalue()


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def segment_server():
    stub = StubSegmenter()
    app = build_segment_app(stub, batch_size=4)
    port = free_port()
    app.serve("127.0.0.1", port, background=True)
    yield f"127.0.0.1:{port}", stub
    app.shutdown()


def test_time_format_round_trip():
    # >1 h: minutes ARE reduced mod 60 — deliberate fix over reference
    # segment_service.py:39-47, whose "1:62:05.500" is invalid H:MM:SS that
    # its own decimal_to_seconds inverts to the wrong value
    assert seconds_to_decimal(3725.5) == "1:02:05.500"
    assert decimal_to_seconds(seconds_to_decimal(3725.5)) == pytest.approx(3725.5)
    assert seconds_to_decimal(65.25) == "1:05.250"
    assert decimal_to_seconds("1:05.250") == pytest.approx(65.25)
    assert decimal_to_seconds("0:02:05.500") == pytest.approx(125.5)


def test_adobe_format_bom_column():
    out = adobe_audition_format({"onset": [1.0], "offset": [2.5],
                                 "cluster": ["x"]})
    assert "﻿Name" in out
    assert out["Start"] == ["0:01.000"]
    assert out["Duration"] == ["0:01.500"]
    assert out["Type"] == ["Cue"]


def test_segment_service_roundtrip(segment_server):
    addr, stub = segment_server
    payload = {
        "audio_file_base64_string":
            base64.b64encode(wav_bytes()).decode("ascii"),
        "sr": 16000,
        "min_frequency": None,  # None values must be dropped server-side
        "spec_time_step": 0.005,
        "num_trials": 2,
    }
    r = requests.post(f"http://{addr}/segment", json=payload)
    assert r.status_code == 201
    assert r.json() == stub.prediction
    call = stub.calls[-1]
    assert call["sr"] == 16000
    assert call["num_trials"] == 2
    assert call["spec_time_step"] == 0.005
    assert call["min_frequency"] is None


def test_segment_service_default_num_trials_is_3(segment_server):
    addr, stub = segment_server
    payload = {"audio_file_base64_string":
               base64.b64encode(wav_bytes()).decode("ascii"), "sr": 16000}
    requests.post(f"http://{addr}/segment", json=payload)
    assert stub.calls[-1]["num_trials"] == 3


def test_segment_service_error_returns_empty(segment_server):
    addr, stub = segment_server
    r = requests.post(f"http://{addr}/segment",
                      json={"audio_file_base64_string": "not-base64!!", "sr": 1})
    assert r.status_code == 201
    assert r.json() == {"onset": [], "offset": [], "cluster": []}


def test_segment_service_adobe_mode(segment_server):
    addr, stub = segment_server
    payload = {"audio_file_base64_string":
               base64.b64encode(wav_bytes()).decode("ascii"), "sr": 16000,
               "adobe_audition_compatible": True}
    r = requests.post(f"http://{addr}/segment", json=payload)
    body = r.json()
    assert "Start" in body and "﻿Name" in body


# ---------------------------------------------------------------------- backend


@pytest.fixture
def backend_server(tmp_path):
    state = BackendState(str(tmp_path / "datasets"), str(tmp_path / "models"),
                         max_num_segmenters_in_ram=1)
    state.model_information["all_models"] = state.list_models()
    app = build_backend(state)
    port = free_port()
    app.serve("127.0.0.1", port, background=True)
    yield f"127.0.0.1:{port}", state, tmp_path
    app.shutdown()


def test_backend_status(backend_server):
    addr, state, _ = backend_server
    r = requests.get(f"http://{addr}/status")
    assert r.json() == {"status": "ready"}


def test_backend_registry_scan(backend_server):
    addr, state, tmp = backend_server
    os.makedirs(tmp / "models" / "m1" / "final_checkpoint")
    models = state.list_models()
    assert [m["model_name"] for m in models] == ["m1"]
    assert models[0]["inference_model_path"].endswith("final_checkpoint")
    assert models[0]["status"] == "ready"


def test_backend_lists_shipped_builtin_pair(tmp_path):
    """Both in-repo ready models register as inference+finetune entries —
    the counterpart of the reference's two hardcoded hub models
    (reference scripts/backend.py:368-375)."""
    from whisperseg_tpu.hub import builtin_models

    builtins = builtin_models()
    for expected in ("whisperseg-base-animal-vad", "whisperseg-tiny-animal-vad"):
        assert expected in builtins, f"missing shipped entry {expected}"
    pretrained = [{"model_name": n, "inference_model_path": p,
                   "finetune_model_path": p} for n, p in builtins.items()]
    state = BackendState(str(tmp_path / "d"), str(tmp_path / "m"),
                         max_num_segmenters_in_ram=1,
                         pretrained_models=pretrained)
    models = {m["model_name"]: m for m in state.list_models()}
    for expected in ("whisperseg-base-animal-vad", "whisperseg-tiny-animal-vad"):
        entry = models[expected]
        assert entry["status"] == "ready"
        assert os.path.exists(os.path.join(entry["inference_model_path"],
                                           "config.json"))
        assert entry["finetune_model_path"] == entry["inference_model_path"]


def test_backend_submit_validation(backend_server):
    addr, state, tmp = backend_server
    # bad name
    r = requests.post(f"http://{addr}/submit-training-request",
                      data={"model_name": "bad name!"},
                      files={"zip": ("d.zip", b"")})
    assert r.status_code == 400 and "special characters" in r.json()["error"]
    # no zip
    os.makedirs(tmp / "models" / "base-model" / "final_checkpoint")
    r = requests.post(f"http://{addr}/submit-training-request",
                      data={"model_name": "newmodel",
                            "initial_model_name": "base-model"})
    assert r.status_code == 400
    assert "No training files" in r.json()["error"]
    # unknown initial model
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a.txt", "hi")
    r = requests.post(f"http://{addr}/submit-training-request",
                      data={"model_name": "newmodel",
                            "initial_model_name": "missing"},
                      files={"zip": ("d.zip", zbuf.getvalue())})
    assert r.status_code == 400
    assert "not available for finetuning" in r.json()["error"]


def test_backend_submit_success_extracts_zip(backend_server):
    addr, state, tmp = backend_server
    os.makedirs(tmp / "models" / "base-model" / "final_checkpoint")
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("f0.wav", "fake")
        zf.writestr("f0.json", "{}")
    r = requests.post(f"http://{addr}/submit-training-request",
                      data={"model_name": "MyModel.v2",
                            "initial_model_name": "base-model",
                            "num_epochs": "5"},
                      files={"zip": ("d.zip", zbuf.getvalue())})
    assert r.status_code == 200, r.json()
    assert os.path.exists(tmp / "datasets" / "mymodel.v2" / "f0.wav")
    q = requests.post(f"http://{addr}/get-training-request-queue").json()
    assert q["response"][0]["model_name"] == "mymodel.v2"
    assert q["response"][0]["num_epochs"] == 5
    assert q["response"][0]["status"] == "queuing"
    # duplicate name now rejected
    r = requests.post(f"http://{addr}/submit-training-request",
                      data={"model_name": "mymodel.v2",
                            "initial_model_name": "base-model"},
                      files={"zip": ("d.zip", zbuf.getvalue())})
    assert r.status_code == 400
    assert "already exists" in r.json()["error"]


def test_backend_segment_with_stub(backend_server, monkeypatch):
    addr, state, tmp = backend_server
    os.makedirs(tmp / "models" / "m2" / "final_checkpoint")
    stub = StubSegmenter({"onset": [0.2], "offset": [0.4], "cluster": ["v"]})
    monkeypatch.setattr(BackendState, "get_segmenter",
                        lambda self, name, path: stub)
    r = requests.post(f"http://{addr}/segment",
                      data={"model_name": "m2", "num_trials": "2"},
                      files={"audio_file": ("a.wav", wav_bytes())})
    assert r.status_code == 200, r.json()
    assert r.json() == {"onset": [0.2], "offset": [0.4], "cluster": ["v"]}
    assert stub.calls[-1]["num_trials"] == 2


def test_backend_segment_unknown_model(backend_server):
    addr, state, tmp = backend_server
    r = requests.post(f"http://{addr}/segment",
                      data={"model_name": "nope"},
                      files={"audio_file": ("a.wav", wav_bytes())})
    assert r.status_code == 400
    assert r.json() == {"onset": [], "offset": [], "cluster": []}


def test_backend_model_list_endpoints(backend_server):
    addr, state, tmp = backend_server
    os.makedirs(tmp / "models" / "m3" / "final_checkpoint")
    state.model_information["all_models"] = state.list_models()
    r = requests.post(f"http://{addr}/list-models-available-for-inference")
    names = [m["model_name"] for m in r.json()["response"]]
    assert names == ["m3"]
    r = requests.post(f"http://{addr}/list-models-training-in-progress")
    assert r.json()["response"] == []


# ------------------------------------------------------------------ post-process


def test_post_process_marmoset_merges_ts_runs():
    # 8 consecutive e_ts calls with tiny gaps, then a distant non-e_ts call that
    # closes the run (reference semantics: a run is only finalized when it is
    # interrupted) -> one e_tw + the closer
    onsets = [0.1 * i for i in range(8)] + [2.0]
    offsets = [0.1 * i + 0.095 for i in range(8)] + [2.1]
    pred = {"onset": onsets, "offset": offsets,
            "cluster": ["e_ts"] * 8 + ["x"]}
    out = post_process_marmoset(pred)
    assert out["cluster"] == ["e_tw", "x"]
    assert out["onset"][0] == pytest.approx(0.0)
    assert out["offset"][0] == pytest.approx(0.795)


def test_post_process_marmoset_short_run_untouched():
    pred = {"onset": [0.0, 0.1, 0.2], "offset": [0.09, 0.19, 0.29],
            "cluster": ["e_ts"] * 3}
    out = post_process_marmoset(pred)
    assert out["cluster"] == ["e_ts"] * 3


def test_post_process_matches_reference_dataframes():
    """Cross-check our list-based port against the reference algorithm run via
    pandas on random inputs (the reference implementation is pure pandas/numpy,
    executed here as an oracle)."""
    pd = pytest.importorskip("pandas")
    import sys

    sys.path.insert(0, "/root/reference/scripts")
    try:
        from post_process_predictions import post_process_marmoset as ref_pp
    except Exception:
        pytest.skip("reference post-process not importable")
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(0)
    for trial in range(10):
        n = rng.randint(3, 25)
        onsets = np.cumsum(rng.uniform(0.001, 0.2, size=n))
        offsets = onsets + rng.uniform(0.01, 0.15, size=n)
        clusters = rng.choice(["e_ts", "e_p1", "e_p2", "x"], size=n,
                              p=[0.6, 0.15, 0.15, 0.1])
        pred = {"onset": onsets.tolist(), "offset": offsets.tolist(),
                "cluster": clusters.tolist()}
        ours = post_process_marmoset(pred)
        ref_df = ref_pp(pd.DataFrame(pred))
        assert ours["cluster"] == ref_df["cluster"].tolist(), (trial, pred)
        np.testing.assert_allclose(ours["onset"], ref_df["onset"].tolist())
        np.testing.assert_allclose(ours["offset"], ref_df["offset"].tolist())


def test_training_queue_journal_survives_restart(tmp_path):
    """Queued requests persist across backend restarts (journal hardening)."""
    from whisperseg_tpu.services.backend import BackendState

    ds = tmp_path / "datasets"
    mb = tmp_path / "models"
    state = BackendState(str(ds), str(mb))
    dset = ds / "mymodel"
    dset.mkdir(parents=True)
    with state.queue_lock:
        state.training_request_queue.append({
            "model_name": "mymodel", "initial_model_name": "base",
            "train_dataset_folder": str(dset), "num_epochs": 3,
            "ignore_cluster": 0, "status": "training",
        })
        state._save_queue_journal()

    revived = BackendState(str(ds), str(mb))
    assert len(revived.training_request_queue) == 1
    item = revived.training_request_queue[0]
    assert item["model_name"] == "mymodel"
    assert item["status"] == "queuing"  # mid-training restarts from queued

    # entries whose dataset folder vanished are dropped
    import shutil
    shutil.rmtree(dset)
    revived2 = BackendState(str(ds), str(mb))
    assert revived2.training_request_queue == []

    # corrupted journal is ignored
    (mb / "training_queue.json").write_text("{not json")
    revived3 = BackendState(str(ds), str(mb))
    assert revived3.training_request_queue == []


def test_segment_service_forwards_decode_knobs(segment_server):
    """num_beams / max_length / top_p request fields must reach the
    segmenter (they were silently dropped once, which made the serving
    bench measure num_beams=4/max_length=448 while claiming greedy)."""
    addr, stub = segment_server
    payload = {
        "audio_file_base64_string":
            base64.b64encode(wav_bytes()).decode("ascii"),
        "sr": 16000,
        "num_trials": 1,
        "num_beams": 1,
        "max_length": 100,
        "top_p": 0.9,
        "refine_boundaries_ms": 25,
        "split_merged_db": 12,
        "merge_gap_ms": 8,
    }
    r = requests.post(f"http://{addr}/segment", json=payload, timeout=30)
    assert r.status_code == 201
    call = stub.calls[-1]
    assert call["num_beams"] == 1
    assert call["max_length"] == 100
    assert call["top_p"] == 0.9
    assert call["refine_boundaries_ms"] == 25
    assert call["split_merged_db"] == 12
    assert call["merge_gap_ms"] == 8
    # and the defaults match segment()'s when the fields are absent
    payload2 = {k: v for k, v in payload.items()
                if k not in ("num_beams", "max_length", "top_p",
                             "refine_boundaries_ms", "split_merged_db",
                             "merge_gap_ms")}
    r = requests.post(f"http://{addr}/segment", json=payload2, timeout=30)
    assert r.status_code == 201
    call = stub.calls[-1]
    assert call["num_beams"] == 4
    # omitted max_length forwards None: segment() resolves it to the
    # checkpoint's trained budget (default_segmentation_config) else 448
    assert call["max_length"] is None
    assert call["top_p"] == 1.0
    assert call["refine_boundaries_ms"] is None
    assert call["split_merged_db"] is None
    assert call["merge_gap_ms"] is None


def test_segment_service_frame_mode(segment_server):
    """``frame_mode: true`` dispatches to segment_from_frames (decoder-free
    frame-VAD path) instead of segment()."""
    addr, stub = segment_server
    frame_pred = {"onset": [0.2], "offset": [0.4], "cluster": ["Vocal"]}
    stub.segment_from_frames = lambda audio, sr, **kw: dict(frame_pred)
    r = requests.post(f"http://{addr}/segment", json={
        "audio_file_base64_string": base64.b64encode(wav_bytes()).decode(),
        "sr": 16000, "frame_mode": True,
    })
    assert r.status_code == 201
    assert r.json() == frame_pred
    assert stub.calls == []  # segment() never invoked


def test_segment_service_frame_mode_error_returns_empty(segment_server):
    """A frame_mode request against a model without a head degrades to the
    empty prediction like every other service failure."""
    addr, stub = segment_server  # stub has no segment_from_frames attribute
    r = requests.post(f"http://{addr}/segment", json={
        "audio_file_base64_string": base64.b64encode(wav_bytes()).decode(),
        "sr": 16000, "frame_mode": True,
    })
    assert r.status_code == 201
    assert r.json() == {"onset": [], "offset": [], "cluster": []}


def test_multipart_parser_preserves_whitespace_class_payload_bytes():
    """Binary uploads whose first/last payload bytes are whitespace-class
    (0x09-0x0D, 0x20) must round-trip intact — only the protocol CRLF around
    each part is removed, never .strip()'d data bytes."""
    from whisperseg_tpu.services.http_util import Request

    payload = b"\r\n\x20\x09RIFFdata\x0d\x0a\x20"
    boundary = b"XBOUND"
    body = (b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="audio_file"; '
            b'filename="a.wav"\r\n'
            b"Content-Type: application/octet-stream\r\n\r\n"
            + payload + b"\r\n"
            b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="model_name"\r\n\r\n'
            b"zf\r\n"
            b"--" + boundary + b"--\r\n")
    req = Request.__new__(Request)
    req.headers = {"Content-Type":
                   'multipart/form-data; boundary="XBOUND"'}
    req.body = body
    req._json = None
    req._form = None
    req._files = None
    assert req.files["audio_file"] == payload
    assert req.form["model_name"] == b"zf"


def test_seconds_to_decimal_past_one_hour():
    """3661 s is 1:01:01.000, not the reference's invalid 1:61:01.000
    (documented divergence)."""
    from whisperseg_tpu.services.segment_service import (
        decimal_to_seconds,
        seconds_to_decimal,
    )

    assert seconds_to_decimal(3661.0) == "1:01:01.000"
    assert decimal_to_seconds(seconds_to_decimal(3661.5)) == 3661.5
    assert seconds_to_decimal(61.25) == "1:01.250"


def test_post_process_predictions_cli(tmp_path):
    """scripts/post_process_predictions.py: taxonomy bridge + toolbox rules
    on a prediction table (reference scripts/post_process_predictions.py)."""
    import subprocess
    import sys

    pred = {"onset": [round(0.1 + 0.05 * i, 3) for i in range(7)] + [0.6],
            "offset": [round(0.145 + 0.05 * i, 3) for i in range(7)] + [0.7],
            "cluster": ["marmoset_ts"] * 7 + ["marmoset_ek"]}
    inp = tmp_path / "pred.json"
    inp.write_text(json.dumps(pred))
    outp = tmp_path / "pred_pp.csv"
    res = subprocess.run(
        [sys.executable, "scripts/post_process_predictions.py",
         "--input", str(inp), "--output", str(outp),
         "--cluster_map", "marmoset_ts=e_ts,marmoset_ek=e_pe"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr
    import pandas as pd

    df = pd.read_csv(outp)
    # the 7-syllable twitter run merged into one e_tw phrase
    assert df["cluster"].tolist() == ["e_tw", "e_pe"]
    assert df["onset"].tolist() == [0.1, 0.6]
    assert df["offset"].tolist() == [0.445, 0.7]
    stats = json.loads(res.stderr.strip().splitlines()[-1])
    assert stats == {"segments_in": 8, "segments_out": 2,
                     "clusters_out": {"e_tw": 1, "e_pe": 1}}

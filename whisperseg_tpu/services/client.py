"""Python client for the backend service (port of reference
scripts/functions_for_calling_backend.py)."""

from __future__ import annotations

import base64
import io
import os
import zipfile


def _zip_folder_bytes(folder_path: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(folder_path):
            for fname in files:
                path = os.path.join(root, fname)
                zf.write(path, os.path.relpath(path, folder_path))
    return buf.getvalue()


def train(service_address: str, train_dataset_folder: str, model_name: str,
          initial_model_name: str = "whisperseg-base", num_epochs: int = 3,
          ignore_cluster: int = 0):
    """Zip a dataset folder in memory and submit a training request
    (reference functions_for_calling_backend.py:14-27)."""
    import requests

    resp = requests.post(
        f"http://{service_address}/submit-training-request",
        files={"zip": ("dataset.zip", _zip_folder_bytes(train_dataset_folder))},
        data={"model_name": model_name,
              "initial_model_name": initial_model_name,
              "num_epochs": num_epochs,
              "ignore_cluster": ignore_cluster},
    )
    return resp.json()


def segment(service_address: str, audio_path: str, model_name: str,
            min_frequency=None, spec_time_step=None, channel_id: int = 0,
            num_trials: int = 1):
    """(reference functions_for_calling_backend.py:29-36)"""
    import requests

    data = {"model_name": model_name, "channel_id": channel_id,
            "num_trials": num_trials}
    if min_frequency is not None:
        data["min_frequency"] = min_frequency
    if spec_time_step is not None:
        data["spec_time_step"] = spec_time_step
    with open(audio_path, "rb") as f:
        resp = requests.post(
            f"http://{service_address}/segment",
            files={"audio_file": (os.path.basename(audio_path), f.read())},
            data=data,
        )
    return resp.json()


def segment_base64(service_address: str, audio_path: str, sr: int, **kwargs):
    """Client for the single-model segment_service (JSON base64 API)."""
    import requests

    payload = {"audio_file_base64_string":
               base64.b64encode(open(audio_path, "rb").read()).decode("ascii"),
               "sr": sr}
    payload.update(kwargs)
    resp = requests.post(f"http://{service_address}/segment", json=payload)
    return resp.json()

#!/usr/bin/env python
"""Web-service round-trip demo (counterpart of the reference's
docs/RunWhisperSegAsWebService.ipynb): start the single-model service
in-process, post base64 audio, print the prediction.

    python examples/web_service_demo.py --model_path ./model/final_checkpoint \
        --audio_path audio.wav
"""

import argparse
import base64
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--audio_path", required=True)
    parser.add_argument("--num_trials", type=int, default=3)
    args = parser.parse_args()

    import requests

    from whisperseg_tpu.audio.io import get_sampling_rate
    from whisperseg_tpu.segmenter import Segmenter
    from whisperseg_tpu.services.segment_service import build_app

    segmenter = Segmenter.from_pretrained(args.model_path)
    app = build_app(segmenter)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    app.serve("127.0.0.1", port, background=True)
    print(f"service listening on 127.0.0.1:{port}")

    payload = {
        "audio_file_base64_string":
            base64.b64encode(open(args.audio_path, "rb").read()).decode("ascii"),
        "sr": get_sampling_rate(args.audio_path),
        "num_trials": args.num_trials,
    }
    r = requests.post(f"http://127.0.0.1:{port}/segment", json=payload)
    print("status:", r.status_code)
    print(r.json())
    app.shutdown()


if __name__ == "__main__":
    main()

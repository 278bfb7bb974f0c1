#!/usr/bin/env python
"""Serving throughput/latency benchmark: concurrent clients against the
segmentation HTTP service, with and without continuous batching.

Spawns `segment_service` as a subprocess (pre-warmed), fires N concurrent
clients each POSTing a real WAV `rounds` times, and reports wall-clock
throughput (audio-seconds/second) and per-request latency percentiles.
Continuous batching (services/batching.py) admits concurrent requests into
shared device batches — the replacement for the reference's global request
semaphore (reference segment_service.py:58-60) — so its win grows with
concurrency.

    python scripts/bench_serve.py --model_path ckpt --audio_path x.wav \
        --clients 8 --rounds 3 --continuous_batching 1

Prints ONE JSON line.
"""

import argparse
import base64
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--audio_path", required=True)
    parser.add_argument("--sr", type=int, default=32000)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--port", type=int, default=8123)
    parser.add_argument("--continuous_batching", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_length", type=int, default=100)
    parser.add_argument("--startup_timeout", type=int, default=600)
    parser.add_argument("--frame_mode", type=int, default=0,
                        help="1: benchmark the decoder-free frame-VAD "
                             "request path (needs a --frame_head model)")
    args = parser.parse_args(argv)

    from whisperseg_tpu.audio.io import get_audio_duration

    duration = get_audio_duration(args.audio_path)
    wav_b64 = base64.b64encode(open(args.audio_path, "rb").read()).decode()
    request = {
        "audio_file_base64_string": wav_b64, "sr": args.sr,
        "num_trials": 1, "num_beams": 1, "max_length": args.max_length,
    }
    if args.frame_mode:
        request["frame_mode"] = True
    body = json.dumps(request).encode()

    proc = subprocess.Popen(
        [sys.executable, "-u", "-m",
         "whisperseg_tpu.services.segment_service",
         "--model_path", args.model_path, "--port", str(args.port),
         "--continuous_batching", str(args.continuous_batching),
         "--batch_size", str(args.batch_size), "--warmup", "1"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{args.port}"
    try:
        deadline = time.time() + args.startup_timeout
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"service exited during startup (code {proc.returncode})"
                    " — run it in the foreground for the traceback")
            try:
                urllib.request.urlopen(base + "/status", timeout=2)
                break
            except Exception:
                time.sleep(2)
        else:
            raise RuntimeError("service did not become ready")

        def post():
            """One request; returns the number of predicted segments.
            The service answers 201 with an EMPTY prediction on any internal
            error (reference behavior), so callers must check emptiness —
            a benchmark of empty responses measures nothing."""
            req = urllib.request.Request(
                base + "/segment", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                out = json.load(resp)
            return len(out.get("onset", []))

        if post() == 0:  # compile/warm the exact request configuration
            raise RuntimeError(
                "warmup request returned an empty prediction — the service "
                "hit an internal error (check model/audio compatibility)")

        latencies = []
        errors = []
        lock = threading.Lock()

        def client():
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                try:
                    nsegs = post()
                    err = None if nsegs > 0 else "empty prediction"
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
                dt = time.perf_counter() - t0
                with lock:
                    if err is None:
                        latencies.append(dt)
                    else:
                        errors.append(err)

        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            # don't let a SIGTERM-ignoring service mask the benchmark result
            proc.kill()
            proc.wait(timeout=30)

    if errors:
        print(json.dumps({"error": f"{len(errors)} failed requests",
                          "examples": errors[:3]}))
        sys.exit(1)
    n = len(latencies)
    latencies.sort()
    p95_idx = max(0, -(-n * 95 // 100) - 1)  # nearest-rank percentile
    print(json.dumps({
        "metric": "serving_audio_seconds_per_second",
        "value": round(n * duration / wall, 2),
        "unit": "audio-s/s",
        "requests": n,
        "clients": args.clients,
        "continuous_batching": bool(args.continuous_batching),
        "frame_mode": bool(args.frame_mode),
        "audio_duration_s": round(duration, 2),
        "latency_p50_s": round(latencies[n // 2], 3),
        "latency_p95_s": round(latencies[p95_idx], 3),
        "wall_s": round(wall, 2),
    }))


if __name__ == "__main__":
    main()

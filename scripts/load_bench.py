"""Serving latency under concurrent load (BASELINE config #5: p50 AND p99).

Starts the production HTTP stack in-process (stdlib ThreadingHTTPServer →
MicroBatcher → bucket-padded jitted forward on the attached device), drives
it with N concurrent clients posting real multipart /predict requests, and
reports client-side p50/p99 plus the server's own /metrics counters.

Writes the result to docs/SERVING_LOAD.json (committed artifact) and prints
one JSON line.

Usage:  python scripts/load_bench.py [--clients 8] [--requests 25] [--tiny]
"""

import argparse
import io
import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")

import numpy as np
from PIL import Image

from vqa_tpu.serving.engine import VQAInference
from vqa_tpu.serving.server import VQAServer
from vqa_tpu.utils.cache import enable_compilation_cache
from vqa_tpu.utils.config import InferenceConfig


def _jpeg_bytes(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    return buf.getvalue()


def _post_predict(url: str, image: bytes, question: str) -> dict:
    boundary = "XLOADBENCHX"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="question"'
        f"\r\n\r\n{question}\r\n".encode()
        + f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
        f'filename="img.jpg"\r\nContent-Type: image/jpeg\r\n\r\n'.encode()
        + image
        + f"\r\n--{boundary}--\r\n".encode()
    )
    req = urllib.request.Request(
        url + "/predict",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=25,
                   help="requests per client")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--timeout-ms", type=float, default=5.0,
                   help="micro-batcher collection window")
    p.add_argument("--out", default="docs/SERVING_LOAD.json")
    args = p.parse_args()

    enable_compilation_cache()
    from vqa_tpu.utils.config import tiny_model_config

    model_config = tiny_model_config() if args.tiny else None
    engine = VQAInference(
        checkpoint_dir="checkpoints", model_config=model_config
    )
    server = VQAServer(engine=engine, preload=True,
                       config=InferenceConfig(batch_timeout_ms=args.timeout_ms))
    t = threading.Thread(target=server.serve, args=("127.0.0.1", 0),
                         daemon=True)
    t.start()
    while server._httpd is None:
        time.sleep(0.05)
    url = f"http://127.0.0.1:{server._httpd.server_address[1]}"

    images = [_jpeg_bytes(i) for i in range(args.clients)]
    questions = [
        "what color is the object", "how many shapes are there",
        "is there a circle", "what is in the image",
    ]

    # one sequential warm pass per client image (path fully warmed already
    # by server preload; this also primes HTTP keep-alives)
    for img in images[:2]:
        _post_predict(url, img, questions[0])

    latencies: list = []
    errors: list = []
    lock = threading.Lock()

    def client(cid: int):
        img = images[cid]
        for i in range(args.requests):
            q = questions[(cid + i) % len(questions)]
            t0 = time.perf_counter()
            try:
                resp = _post_predict(url, img, q)
                ok = resp.get("success", False)
            except Exception as e:
                ok = False
                with lock:
                    errors.append(str(e))
            dt = (time.perf_counter() - t0) * 1000
            if ok:
                with lock:
                    latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    if not latencies:  # keep the diagnostics instead of an IndexError
        print(json.dumps({
            "metric": "serving_latency_under_load",
            "errors": len(errors),
            "error_samples": errors[:5],
        }))
        sys.exit(1)
    arr = np.asarray(latencies)
    result = {
        "metric": "serving_latency_under_load",
        "clients": args.clients,
        "requests_total": int(arr.size),
        "errors": len(errors),
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p90_ms": round(float(np.percentile(arr, 90)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
        "mean_ms": round(float(arr.mean()), 2),
        "throughput_rps": round(arr.size / wall, 2),
        "server_metrics": server.batcher.latency_stats(),
        "model": "tiny" if args.tiny else "full-size",
        "backend": __import__("jax").default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    server.shutdown()


if __name__ == "__main__":
    main()
    import os

    sys.stdout.flush()
    os._exit(0)

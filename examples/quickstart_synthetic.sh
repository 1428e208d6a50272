#!/usr/bin/env bash
# Train -> evaluate -> serve -> query, end to end, with no dataset download.
# The synthetic data (vqa_tpu/data/synthetic.py) is learnable colored-shapes
# VQA: the full-size model reaches ~80% val top-1 from scratch in ~12 epochs
# on one TPU chip (docs/PERF.md "lifecycle demonstration").
set -euo pipefail

CKPT=${CKPT:-/tmp/vqa_quickstart}
export PORT=${PORT:-8000}
EPOCHS=${EPOCHS:-12}

# 1) train the full-size model (EPOCHS=2 for a quick smoke; 12 reaches ~80%)
python -m vqa_tpu.training.train --synthetic --epochs "$EPOCHS" \
    --batch-size 64 --subset-size 2000 --device-aug --checkpoint-dir "$CKPT"

# 2) evaluate the exact val split the training run held out (the split spec
#    rides in the checkpoint sidecar)
python -m vqa_tpu.training.evaluate --checkpoint-dir "$CKPT" --synthetic
cat "$CKPT"/evaluation_report.txt | head -30

# 3) serve it
python -m vqa_tpu.serving.server --checkpoint-dir "$CKPT" --port "$PORT" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT
for i in $(seq 1 60); do  # engine load + warmup can take a while cold
    curl -fsS "http://localhost:$PORT/health" >/dev/null 2>&1 && break
    sleep 2
done

# 4) query: generate a scene the model has never seen and ask about it
python - "$CKPT" <<'EOF'
import sys, urllib.request, json, io
from vqa_tpu.data.synthetic import generate_scene  # deterministic scenes
img_bytes, question, answer = generate_scene(seed=987654)
boundary = "----vqaexample"
body = io.BytesIO()
def part(name, value, filename=None, ctype=None):
    body.write(f"--{boundary}\r\n".encode())
    disp = f'Content-Disposition: form-data; name="{name}"'
    if filename:
        disp += f'; filename="{filename}"'
    body.write((disp + "\r\n").encode())
    if ctype:
        body.write(f"Content-Type: {ctype}\r\n".encode())
    body.write(b"\r\n")
    body.write(value if isinstance(value, bytes) else value.encode())
    body.write(b"\r\n")
part("image", img_bytes, "scene.png", "image/png")
part("question", question)
body.write(f"--{boundary}--\r\n".encode())
import os
port = os.environ.get("PORT", "8000")
req = urllib.request.Request(
    f"http://localhost:{port}/predict", data=body.getvalue(),
    headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
resp = json.load(urllib.request.urlopen(req, timeout=120))
print(f"Q: {question}\nexpected: {answer}\ngot: "
      f"{resp['top_answer']} ({resp['confidence']:.3f})")
EOF

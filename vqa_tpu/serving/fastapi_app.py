"""Optional FastAPI/ASGI adapter — same contract as serving/server.py.

FastAPI is not baked into this image, so this module is import-gated: it
reuses VQAServer's transport-independent handlers when fastapi IS available
(e.g., a production deployment), exposing the identical endpoint surface
(reference: api/main.py:74-321).
"""

from __future__ import annotations

from typing import List, Optional

try:
    from fastapi import FastAPI, File, Form, Request, UploadFile
    from fastapi.middleware.cors import CORSMiddleware

    HAS_FASTAPI = True
except ImportError:  # pragma: no cover - not in this image
    HAS_FASTAPI = False


def create_app(checkpoint_dir: Optional[str] = None):
    if not HAS_FASTAPI:
        raise ImportError(
            "fastapi is not installed; use vqa_tpu.serving.server (stdlib) "
            "which exposes the same endpoints"
        )
    from fastapi.responses import JSONResponse

    from vqa_tpu.serving.server import VQAServer

    server = VQAServer(checkpoint_dir=checkpoint_dir)

    def respond(status_payload):
        # preserve the handlers' HTTP status (400 validation, 500 failure)
        status, payload = status_payload
        return JSONResponse(payload, status_code=status)
    app = FastAPI(title="VQA API", version="1.0.0")
    app.add_middleware(
        CORSMiddleware,
        allow_origins=["*"],
        allow_credentials=True,
        allow_methods=["*"],
        allow_headers=["*"],
    )

    @app.get("/")
    async def root():
        return server.handle_get("/")[1]

    @app.get("/health")
    async def health():
        return server.handle_get("/health")[1]

    @app.get("/model-info")
    async def model_info():
        return server.handle_get("/model-info")[1]

    @app.get("/metrics")
    async def metrics():
        return server.handle_get("/metrics")[1]

    def _too_large():
        from fastapi import HTTPException

        raise HTTPException(
            status_code=413,
            detail=f"request body exceeds {server.cfg.max_body_mb} MB",
        )

    def _cap_bytes() -> int:
        return server.cfg.max_body_mb * 1024 * 1024

    @app.middleware("http")
    async def _content_length_cap(request: "Request", call_next):
        # reject on the declared Content-Length BEFORE the body is consumed,
        # like the stdlib server — FastAPI resolves File()/Form() deps by
        # parsing the ENTIRE multipart body before an endpoint function
        # runs, so this check must live in middleware (which runs first),
        # not in the endpoint. The cap is a memory backstop; firing it
        # after buffering would defeat it.
        cl = request.headers.get("content-length")
        if cl is not None:
            try:
                if int(cl) > _cap_bytes():
                    # same 413 shape as _too_large() and the stdlib
                    # server (serving/server.py do_POST): {"detail": ...}
                    return JSONResponse(
                        {
                            "detail": "request body exceeds "
                                      f"{server.cfg.max_body_mb} MB",
                        },
                        status_code=413,
                    )
            except ValueError:
                pass  # malformed header; post-read _cap still applies
        return await call_next(request)

    def _cap(data: bytes, already: int = 0):
        # post-read backstop for chunked bodies (no Content-Length);
        # `already` makes the cap cover the SUM across a multi-file request
        if already + len(data) > _cap_bytes():
            _too_large()
        return data

    @app.post("/predict")
    async def predict(
        image: UploadFile = File(...),
        question: str = Form(...),
        top_k: int = Form(5),
    ):
        data = _cap(await image.read())
        fields = {
            "image": [(image.filename, data)],
            "question": [(None, question.encode())],
            "top_k": [(None, str(top_k).encode())],
        }
        return respond(server.handle_predict(fields))

    @app.post("/attention")
    async def attention(
        image: UploadFile = File(...),
        question: str = Form(...),
        top_k: int = Form(5),
    ):
        data = _cap(await image.read())
        fields = {
            "image": [(image.filename, data)],
            "question": [(None, question.encode())],
            "top_k": [(None, str(top_k).encode())],
        }
        return respond(server.handle_attention(fields))

    @app.post("/predict-batch")
    async def predict_batch(
        images: List[UploadFile] = File(...),
        questions: str = Form(...),
    ):
        blobs = []
        total = 0
        for im in images:
            data = _cap(await im.read(), already=total)
            total += len(data)
            blobs.append((im.filename, data))
        fields = {
            "images": blobs,
            "questions": [(None, questions.encode())],
        }
        return respond(server.handle_predict_batch(fields))

    return app

#!/usr/bin/env python3
"""Dev server (reference scripts/serve/app.py parity).

Loads a checkpoint's embedding table or a random demo model and serves
recommendations by the mean-of-item-embeddings session approximation + cosine
scoring (reference :169-187 — deliberately NOT the real GNN; that lives in
gat_recommendation_tpu.serving.app). Endpoints: /recommend, /recommend/batch,
/health. Stdlib HTTP transport.
"""

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


class MeanEmbeddingModel:
    """Session = mean of item embeddings; scores = cosine similarity."""

    def __init__(self, item_embeddings: np.ndarray):
        self.item_embeddings = item_embeddings.astype(np.float32)
        norms = np.linalg.norm(self.item_embeddings, axis=1, keepdims=True)
        self._normed = self.item_embeddings / np.maximum(norms, 1e-12)
        self.num_items, self.embedding_dim = item_embeddings.shape

    @classmethod
    def demo(cls, num_items: int = 10_000, dim: int = 256, seed: int = 42):
        rng = np.random.default_rng(seed)
        return cls(rng.standard_normal((num_items, dim)).astype(np.float32))

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str):
        import jax

        from gat_recommendation_tpu.models import create_model
        from gat_recommendation_tpu.train import checkpoint as ckpt

        meta = ckpt.load_meta(ckpt_dir)
        cfg = dict(meta["model_config"])
        model = create_model(meta["model_name"], cfg.pop("num_items"), **cfg)
        p_tmpl, s_tmpl = model.init_params(jax.random.key(0))
        params, _ = ckpt.restore_params_state(ckpt_dir, p_tmpl, s_tmpl)
        return cls(np.asarray(params["item_embedding"]))

    @classmethod
    def from_npy(cls, path: str):
        return cls(np.load(path))

    def recommend(self, session_items: list[int], k: int) -> tuple[list[int], list[float]]:
        valid = [i for i in session_items if 0 < i < self.num_items]
        if not valid:
            raise ValueError("no valid item ids in session")
        sess = self.item_embeddings[valid].mean(axis=0)
        sess = sess / max(float(np.linalg.norm(sess)), 1e-12)
        scores = self._normed @ sess
        scores[valid] = -np.inf
        scores[0] = -np.inf
        top = np.argsort(-scores)[:k]
        return top.tolist(), scores[top].tolist()


def handle(model, method: str, path: str, body: dict | None) -> tuple[int, dict]:
    if method == "GET" and path == "/health":
        return 200, {"status": "ok", "model_loaded": True,
                     "num_items": model.num_items, "embedding_dim": model.embedding_dim}

    if method == "POST" and path == "/recommend":
        items = (body or {}).get("session_items")
        if not items or not isinstance(items, list):
            return 400, {"detail": "session_items must be a non-empty list"}
        k = (body or {}).get("k", 10)
        try:
            t0 = time.perf_counter()
            recs, scores = model.recommend(items, int(k))
            return 200, {"recommendations": recs, "scores": scores,
                         "latency_ms": round((time.perf_counter() - t0) * 1000, 3)}
        except ValueError as e:
            return 400, {"detail": str(e)}

    if method == "POST" and path == "/recommend/batch":
        sessions = (body or {}).get("sessions")
        if not isinstance(sessions, list):
            return 400, {"detail": "sessions must be a list"}
        k = (body or {}).get("k", 10)
        out = []
        for s in sessions:
            try:
                recs, scores = model.recommend(s, int(k))
                out.append({"recommendations": recs, "scores": scores})
            except ValueError as e:
                out.append({"error": str(e)})
        return 200, {"results": out}

    return 404, {"detail": f"no route {method} {path}"}


def make_server(model, host: str = "127.0.0.1", port: int = 0):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, status, payload):
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            self._send(*handle(model, "GET", self.path, None))

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length)) if length else None
            except json.JSONDecodeError:
                self._send(400, {"detail": "invalid JSON"})
                return
            self._send(*handle(model, "POST", self.path, body))

        def log_message(self, *a):
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    parser = argparse.ArgumentParser(description="Dev recommendation server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--embeddings", type=str, default=None)
    args = parser.parse_args()

    if args.checkpoint and Path(args.checkpoint).exists():
        model = MeanEmbeddingModel.from_checkpoint(args.checkpoint)
        print(f"loaded checkpoint {args.checkpoint}")
    elif args.embeddings and Path(args.embeddings).exists():
        model = MeanEmbeddingModel.from_npy(args.embeddings)
        print(f"loaded embeddings {args.embeddings}")
    else:
        model = MeanEmbeddingModel.demo()
        print("using demo model (random embeddings)")

    server = make_server(model, args.host, args.port)
    print(f"dev server listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

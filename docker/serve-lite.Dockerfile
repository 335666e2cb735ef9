# Slim production inference image (~parity role of reference
# docker/serve-onnx.Dockerfile: numpy-only mean-embedding scoring, no JAX).
FROM python:3.11-slim

ENV PYTHONUNBUFFERED=1 PIP_NO_CACHE_DIR=1 PORT=8080 INFERENCE_MODE=embeddings

WORKDIR /app
RUN pip install numpy scipy prometheus-client google-cloud-storage

COPY gat_recommendation_tpu/serving/monitoring.py ./gat_recommendation_tpu/serving/monitoring.py
COPY gat_recommendation_tpu/__init__.py ./gat_recommendation_tpu/__init__.py
RUN touch ./gat_recommendation_tpu/serving/__init__.py
COPY scripts/serve ./scripts/serve

RUN useradd -m server
USER server

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD python -c "import urllib.request,os;urllib.request.urlopen(f'http://127.0.0.1:{os.environ[\"PORT\"]}/health')"

CMD ["python", "scripts/serve/vertex_app.py"]

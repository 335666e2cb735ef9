# Real-GNN serving image (CPU JAX inference; parity role of reference
# docker/serve.Dockerfile).
FROM python:3.11-slim

ENV PYTHONUNBUFFERED=1 PIP_NO_CACHE_DIR=1 PORT=8000

WORKDIR /app
RUN pip install jax optax orbax-checkpoint numpy pandas scipy pyyaml \
    pydantic prometheus-client

COPY pyproject.toml ./
COPY gat_recommendation_tpu ./gat_recommendation_tpu
RUN pip install -e . --no-deps

RUN useradd -m server
USER server

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD python -c "import urllib.request,os;urllib.request.urlopen(f'http://127.0.0.1:{os.environ[\"PORT\"]}/health')"

CMD ["python", "-m", "gat_recommendation_tpu.serving.app", "--port", "8000"]

# Training image for TPU VMs (parity role of reference docker/train.Dockerfile,
# which was pytorch+cu118+PyG; here: jax[tpu]).
FROM python:3.11-slim

ENV PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential curl && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# jax[tpu] pulls libtpu from the Google releases index.
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    optax orbax-checkpoint numpy pandas scipy pyyaml rich google-cloud-storage

COPY pyproject.toml ./
COPY gat_recommendation_tpu ./gat_recommendation_tpu
COPY scripts ./scripts
COPY configs ./configs
RUN pip install -e . --no-deps

# Non-root user (reference parity)
RUN useradd -m trainer
USER trainer

ENTRYPOINT ["python", "scripts/train/train_baseline.py"]

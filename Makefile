# gat-recommendation-tpu — development targets (parity with reference Makefile)

PYTHON ?= python
DATA_DIR ?= data

.PHONY: help install lint format test test-fast data train evaluate smoke \
        pipeline-validate quality-gate export serve serve-dev bench clean

help:
	@grep -E '^[a-zA-Z_-]+:.*?## .*$$' $(MAKEFILE_LIST) | awk 'BEGIN {FS = ":.*?## "}; {printf "  %-18s %s\n", $$1, $$2}'

install: ## Editable install (offline-safe)
	pip install -e . --no-deps --no-build-isolation

lint: ## Ruff lint (if installed)
	-ruff check gat_recommendation_tpu scripts tests

format: ## Ruff format (if installed)
	-ruff format gat_recommendation_tpu scripts tests

test: ## Full pytest suite (8 virtual CPU devices)
	$(PYTHON) -m pytest tests/ -q

test-fast: ## Fast subset (no slow markers)
	$(PYTHON) -m pytest tests/ -q -m "not slow"

data: ## Synthetic data -> sessions -> splits -> graph
	$(PYTHON) scripts/data/00_generate_synthetic_data.py --output-file $(DATA_DIR)/raw/events.csv
	$(PYTHON) scripts/data/02_sessionize.py --input-file $(DATA_DIR)/raw/events.csv \
		--output-file $(DATA_DIR)/interim/sessions.csv --stats-file $(DATA_DIR)/interim/session_stats.json
	$(PYTHON) scripts/data/03_temporal_split.py --input-file $(DATA_DIR)/interim/sessions.csv \
		--output-dir $(DATA_DIR)/processed
	$(PYTHON) scripts/data/04_build_graph.py --input-file $(DATA_DIR)/processed/train.csv \
		--output-file $(DATA_DIR)/processed/graph_edges.csv --stats-file $(DATA_DIR)/processed/graph_stats.json

data-refscale: ## Rebuild the reference-scale corpus (sha256-verified, ~30 s)
	$(PYTHON) scripts/data/regen_refscale.py --check

data-retailrocket: ## Download RetailRocket (requires Kaggle credentials)
	$(PYTHON) scripts/data/01_download_retailrocket.py --output-dir $(DATA_DIR)/raw

train: ## Train the flagship model
	$(PYTHON) scripts/train/train_baseline.py --model graph_transformer_optimized

evaluate: ## Evaluate checkpoints on the test split
	$(PYTHON) scripts/evaluate_local.py

smoke: ## 2-epoch smoke training of all 4 models
	$(PYTHON) scripts/smoke_test_all_models.py

pipeline-validate: ## Subset validation of all models (DVC gate)
	$(PYTHON) scripts/pipeline/run_full_pipeline.py

quality-gate: ## Artifact/metrics/latency deploy gate
	$(PYTHON) scripts/pipeline/model_quality_gate.py

export: ## Export serving artifacts (embeddings + metadata)
	$(PYTHON) scripts/pipeline/export_onnx.py --mode production

serve: ## Real-GNN serving (v2)
	$(PYTHON) -m gat_recommendation_tpu.serving.app --port 8000

serve-dev: ## Dev server (mean-embedding approximation)
	$(PYTHON) scripts/serve/app.py --port 8080

bench: ## Throughput benchmark (one JSON line)
	$(PYTHON) bench.py

clean:
	rm -rf outputs exports .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +

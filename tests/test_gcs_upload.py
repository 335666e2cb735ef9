"""End-of-training GCS upload (reference train_baseline.py:107-119,286 parity).

Uses an injected fake storage client — no network, no google-cloud-storage
dependency needed.
"""

import importlib.util
import logging
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_train_cli():
    spec = importlib.util.spec_from_file_location(
        "train_baseline", REPO / "scripts" / "train" / "train_baseline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeBlob:
    def __init__(self, name, record):
        self.name = name
        self.record = record

    def upload_from_filename(self, local):
        self.record[self.name] = Path(local).read_bytes()


class FakeBucket:
    def __init__(self, record):
        self.record = record

    def blob(self, name):
        return FakeBlob(name, self.record)


class FakeClient:
    def __init__(self):
        self.uploaded: dict[str, bytes] = {}

    def bucket(self, name):
        return FakeBucket(self.uploaded)


def test_upload_walks_output_dir(tmp_path):
    cli = _load_train_cli()
    out = tmp_path / "graph_transformer_optimized"
    (out / "checkpoint_best" / "arrays").mkdir(parents=True)
    (out / "checkpoint_best" / "meta.json").write_text("{}")
    (out / "checkpoint_best" / "arrays" / "d0").write_bytes(b"\x00\x01")
    (out / "history.json").write_text('{"train_loss": []}')

    client = FakeClient()
    n = cli.maybe_gcs_upload(
        "my-bucket", out, logging.getLogger("t"), client=client
    )
    assert n == 3
    # Remote names keep the model-dir prefix, matching the download layout.
    assert set(client.uploaded) == {
        "graph_transformer_optimized/checkpoint_best/meta.json",
        "graph_transformer_optimized/checkpoint_best/arrays/d0",
        "graph_transformer_optimized/history.json",
    }
    assert client.uploaded["graph_transformer_optimized/checkpoint_best/arrays/d0"] == b"\x00\x01"


def test_upload_noop_without_bucket(tmp_path):
    cli = _load_train_cli()
    assert cli.maybe_gcs_upload(None, tmp_path, logging.getLogger("t")) == 0

"""Real-GNN per-request recommender (re-design of reference etpgt/serving/recommender.py:25-137).

Loads the trained optimized Graph Transformer checkpoint and serves top-k by
running the actual jitted GNN forward on the session's induced co-occurrence
subgraph, then a full-catalog dot-product with seen-item and padding masking.

Reference-parity behaviors kept:
  * rejects FFN checkpoints (:53-58);
  * architecture recoverable without trusting the caller — we read the stored
    model_config, then cross-check it against array shapes (the reference
    infers purely from tensor shapes, :61-64);
  * adjacency built from the edges file with self-loops skipped (:91-97);
  * seen items and padding index masked to -inf before top-k (:132-134).

TPU-native differences: requests are padded to node-count buckets so each
bucket compiles exactly one XLA program; scoring runs as a jitted matmul+top_k.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gat_recommendation_tpu.serving.validation import ValidatedRequest


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


# Below this catalog size the full f32 scan is already sub-ms and the int8
# candidate path would only add moving parts.
FAST_SCORING_MIN_ROWS = 100_000
# Candidate margin for the int8 path: top-k membership is decided at L >> k
# where the int8 rounding error (~0.5 score units on unit-normal tables,
# measured) cannot demote a true top-k item out of the candidate set; the
# final ordering is re-ranked exactly in f32.
FAST_SCORING_CANDIDATES = 1024


class Recommender:
    """Loads the trained optimized model + co-occurrence graph and serves top-k.

    int8_scoring="auto" (default): on CPU backends with a reference-scale
    catalog and the native library available, the full-catalog scan runs
    through the int8 candidate scorer (native/scorer.cpp — 4x less memory
    traffic than the f32 GEMV) followed by an EXACT f32 re-rank of the top
    FAST_SCORING_CANDIDATES rows. True forces it (asserts native), False
    always uses the exact jitted GEMV (the reference's serving semantics,
    etpgt/serving/recommender.py:120-137).
    """

    def __init__(
        self,
        checkpoint_path: Path | str,
        graph_edges_path: Path | str,
        buckets: tuple[int, ...] = (8, 16, 32, 56),
        warmup: bool = True,
        int8_scoring: bool | str = "auto",
    ):
        self.buckets = buckets
        self._load_model(Path(checkpoint_path))
        self._load_graph(Path(graph_edges_path))
        self._forward_cache: dict = {}
        self._setup_fast_scoring(int8_scoring)
        if warmup:
            # Compile each bucket's program up-front with the default k so the
            # first real request pays no compile latency.
            from gat_recommendation_tpu.serving.config import DEFAULT_LIMITS

            for b in buckets:
                self.recommend(
                    ValidatedRequest(session_items=[1, 2], k=DEFAULT_LIMITS.default_k),
                    _force_bucket=b,
                )

    @classmethod
    def from_default(cls, **kwargs) -> "Recommender":
        root = _repo_root()
        return cls(
            root / "checkpoints" / "best_model",
            root / "data" / "processed" / "graph_edges.csv",
            **kwargs,
        )

    def _load_model(self, checkpoint_path: Path) -> None:
        import jax

        from gat_recommendation_tpu.models import create_model
        from gat_recommendation_tpu.train import checkpoint as ckpt

        meta = ckpt.load_meta(checkpoint_path)
        cfg = dict(meta["model_config"])
        if cfg.get("use_ffn"):
            raise RuntimeError(
                "This Recommender targets the optimized (no-FFN) checkpoint, but the "
                "given checkpoint has FFN layers. Load the optimized model instead."
            )
        num_items = cfg.pop("num_items")
        self.model = create_model(meta["model_name"], num_items, **cfg)

        p_tmpl, s_tmpl = self.model.init_params(jax.random.key(0))
        self.params, self.state = ckpt.restore_params_state(checkpoint_path, p_tmpl, s_tmpl)

        # Cross-check stored config against array shapes (shape-inference
        # parity; tables are padded to a row multiple for even sharding).
        from gat_recommendation_tpu.models.base import padded_rows

        table = self.params["item_embedding"]
        self.num_items, self.embedding_dim = num_items, int(table.shape[1])
        assert int(table.shape[0]) == padded_rows(num_items), "meta/array num_items mismatch"
        self.checkpoint_epoch = int(meta.get("epoch", -1))
        self.val_recall_at_10 = float(meta.get("best_val_metric", float("nan")))

    def _load_graph(self, graph_edges_path: Path) -> None:
        from gat_recommendation_tpu.data.batching import build_csr
        from gat_recommendation_tpu.data.graph import load_edges

        item_i, item_j = load_edges(graph_edges_path)
        keep = item_i != item_j  # skip self-loops for message passing (reference :95)
        self.graph = build_csr(item_i[keep], item_j[keep], self.num_items)

    def _setup_fast_scoring(self, int8_scoring: bool | str) -> None:
        import jax

        from gat_recommendation_tpu.data import native

        want = (
            int8_scoring is True
            or (
                int8_scoring == "auto"
                and jax.default_backend() == "cpu"
                and self.params["item_embedding"].shape[0] >= FAST_SCORING_MIN_ROWS
            )
        )
        if int8_scoring is True:
            assert native.available(), "int8_scoring=True but libbatcher.so unavailable"
        self.int8_scoring = bool(want and native.available())
        if not self.int8_scoring:
            return
        # One-time at load: f32 host copy (re-rank gathers read it) + int8
        # quantized copy with per-row scales. Padding row 0 and phantom rows
        # past num_items get scale 0 => never selected as candidates.
        self._table_np = np.ascontiguousarray(
            np.asarray(self.params["item_embedding"], dtype=np.float32)
        )
        self._q, self._q_scale, self._q_rowsum = native.quantize_table(self._table_np)
        self._q_scale[0] = 0.0
        self._q_scale[self.num_items :] = 0.0

    # -- jitted per-bucket forward ----------------------------------------

    def _forward_fn(self, bucket_n: int):
        if bucket_n in self._forward_cache:
            return self._forward_cache[bucket_n]
        import jax
        import jax.numpy as jnp

        model = self.model

        def fwd(params, state, node_ids, node_mask, adj, num_nodes, seen_mask, k):
            from gat_recommendation_tpu.data.batching import SessionBatch

            batch = SessionBatch(
                node_ids=node_ids,
                node_mask=node_mask,
                adj=adj,
                num_nodes=num_nodes,
                targets=jnp.zeros((1,), jnp.int32),
                negatives=jnp.zeros((1, 1), jnp.int32),
                sample_mask=jnp.ones((1,), bool),
            )
            sess, _ = model.apply(params, state, batch, model.config, train=False)
            scores = jnp.dot(
                sess, params["item_embedding"].T, preferred_element_type=jnp.float32
            )[0]
            scores = jnp.where(seen_mask, -jnp.inf, scores)
            scores = scores.at[0].set(-jnp.inf)  # padding index
            from gat_recommendation_tpu.models.base import mask_phantom

            scores = mask_phantom(scores, model.config.num_items)
            top_scores, top_idx = jax.lax.top_k(scores, k)
            return top_idx, top_scores

        # k is static per compile; wrap to cache per-(bucket, k).
        self._forward_cache[bucket_n] = jax.jit(fwd, static_argnames=("k",))
        return self._forward_cache[bucket_n]

    def _embed_fn(self, bucket_n: int):
        """Jitted GNN forward WITHOUT catalog scoring — the int8 path scores
        natively. Cached per bucket alongside the full forwards."""
        key = ("embed", bucket_n)
        if key in self._forward_cache:
            return self._forward_cache[key]
        import jax
        import jax.numpy as jnp

        model = self.model

        def embed(params, state, node_ids, node_mask, adj, num_nodes):
            from gat_recommendation_tpu.data.batching import SessionBatch

            batch = SessionBatch(
                node_ids=node_ids,
                node_mask=node_mask,
                adj=adj,
                num_nodes=num_nodes,
                targets=jnp.zeros((1,), jnp.int32),
                negatives=jnp.zeros((1, 1), jnp.int32),
                sample_mask=jnp.ones((1,), bool),
            )
            sess, _ = model.apply(params, state, batch, model.config, train=False)
            return sess[0]

        self._forward_cache[key] = jax.jit(embed)
        return self._forward_cache[key]

    def _build_session_batch(self, items: list[int], bucket_n: int):
        from gat_recommendation_tpu.data.batching import induced_edges

        nodes = np.unique(np.asarray(items, dtype=np.int64))
        n = min(len(nodes), bucket_n)
        nodes = nodes[:n]
        src, dst = induced_edges(self.graph, nodes)

        node_ids = np.zeros((1, bucket_n), np.int32)
        node_ids[0, :n] = nodes
        node_mask = np.zeros((1, bucket_n), bool)
        node_mask[0, :n] = True
        adj = np.zeros((1, bucket_n, bucket_n), bool)
        adj[0, dst, src] = True
        return node_ids, node_mask, adj, np.array([n], np.int32)

    def recommend(
        self, request: ValidatedRequest, _force_bucket: int | None = None
    ) -> tuple[list[int], list[float]]:
        """Return (item_ids, scores) for the top-k recommendations, best first."""
        import jax.numpy as jnp

        items = request.session_items
        n_unique = len(set(items))
        bucket_n = _force_bucket or next(
            (b for b in self.buckets if n_unique <= b), self.buckets[-1]
        )

        from gat_recommendation_tpu.models.base import padded_rows

        node_ids, node_mask, adj, num_nodes = self._build_session_batch(items, bucket_n)
        if self.int8_scoring:
            from gat_recommendation_tpu.data import native

            embed = self._embed_fn(bucket_n)
            sess = np.asarray(
                embed(
                    self.params, self.state,
                    jnp.asarray(node_ids), jnp.asarray(node_mask),
                    jnp.asarray(adj), jnp.asarray(num_nodes),
                )
            )
            seen8 = np.zeros((self._table_np.shape[0],), np.uint8)
            seen8[list(set(items))] = 1
            L = max(FAST_SCORING_CANDIDATES, 8 * request.k)
            cand, _ = native.score_int8_topl(
                self._q, self._q_scale, self._q_rowsum, sess, L, seen=seen8
            )
            # Exact f32 re-rank of the candidates (L x D gather — microseconds).
            exact = self._table_np[cand] @ sess
            order = np.argsort(-exact, kind="stable")[: request.k]
            return cand[order].tolist(), exact[order].astype(float).tolist()

        seen = np.zeros((padded_rows(self.num_items),), bool)  # scores are table-length
        seen[list(set(items))] = True

        fwd = self._forward_fn(bucket_n)
        top_idx, top_scores = fwd(
            self.params,
            self.state,
            jnp.asarray(node_ids),
            jnp.asarray(node_mask),
            jnp.asarray(adj),
            jnp.asarray(num_nodes),
            jnp.asarray(seen),
            k=request.k,
        )
        return np.asarray(top_idx).tolist(), [float(v) for v in np.asarray(top_scores)]

    def health(self) -> dict:
        return {
            "num_items": self.num_items,
            "embedding_dim": self.embedding_dim,
            "checkpoint_epoch": self.checkpoint_epoch,
            "val_recall_at_10": self.val_recall_at_10,
            "int8_scoring": self.int8_scoring,
        }

"""Bucketed fixed-shape session-graph batching — the TPU foundation layer.

Replaces the reference's SessionDataset + collate_fn (etpgt/train/
dataloader.py:12-241): instead of dynamic-shaped PyG Batch objects built by
per-edge Python loops, every batch here is a fixed-shape `SessionBatch` whose
node count is padded to one of a small set of buckets, so each (batch_size,
bucket) pair compiles exactly once under jit (SURVEY.md §7 hard part #1).

Design:
  * the co-occurrence graph is pre-indexed as CSR adjacency (vs the
    reference's pandas `isin` over the full 738k-edge DataFrame per sample,
    dataloader.py:126-154);
  * the per-session induced subgraph is a dense boolean adjacency
    `adj[b, dst, src]` over the bucket's node slots — message passing then
    runs as masked MXU matmuls, never gather/scatter;
  * negatives are rejection-sampled from [1, num_items) excluding the full
    session (reference _sample_negatives parity, dataloader.py:107-124);
  * two assembly engines produce byte-identical batches (modulo the
    negative-sampling stream): `numpy` (reference implementation below) and
    `native` (C++ via ctypes, native/batcher.cpp).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import queue
import threading
from pathlib import Path
from typing import NamedTuple

import jax
import numpy as np

# Node-count buckets. Sessions are truncated to the last 50 events
# (reference dataloader.py:85-86), so unique context nodes <= 49 < 56; the
# largest bucket always fits and bigger node sets are truncated.
DEFAULT_BUCKETS = (8, 16, 32, 56)


def pick_bucket(n: int, buckets=DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n; the largest bucket if none fits (truncation)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ---------------------------------------------------------------------------
# SessionBatch — the fixed-shape unit of work
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SessionBatch:
    """One fixed-shape batch of padded session graphs (a jax pytree).

    node_ids    [B, N] int32 — global item ids, ascending per session, 0-padded
    node_mask   [B, N] bool  — valid node slots
    adj         [B, N, N] bool — adj[b, dst, src] = edge src->dst (local ids)
                (or bit-packed [B, N, ceil(N/8)] uint8 on the transfer edge —
                see pack_adj; models call dense_adj() and never notice)
    num_nodes   [B] int32    — valid node count per session
    targets     [B] int32    — next-item label (last session event)
    negatives   [B, K] int32 — sampled negative item ids
    sample_mask [B] bool     — valid samples (False = batch padding slot)
    """

    node_ids: np.ndarray
    node_mask: np.ndarray
    adj: np.ndarray
    num_nodes: np.ndarray
    targets: np.ndarray
    negatives: np.ndarray
    sample_mask: np.ndarray

    @property
    def batch_size(self) -> int:
        return int(self.node_ids.shape[0])

    @property
    def nodes_per_session(self) -> int:
        return int(self.node_ids.shape[1])

    def dense_adj(self):
        """The [B, N, N] bool adjacency, unpacking the bit-packed transfer
        form if present. Shape-static, so jit-safe; XLA fuses the unpack
        (shift/and/reshape) into the consuming masked matmul."""
        if self.adj.dtype == np.bool_:
            return self.adj
        import jax.numpy as jnp

        n = self.node_ids.shape[1]
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB-first
        bits = (self.adj[..., None] >> shifts) & jnp.uint8(1)
        flat = bits.reshape(*self.adj.shape[:-1], self.adj.shape[-1] * 8)
        return flat[..., :n].astype(bool)


def pack_adj(batch: SessionBatch) -> SessionBatch:
    """Bit-pack the adjacency for host->device transfer (8x fewer bytes on
    the batch's dominant tensor; ~1.3 ms/step through the remote relay at
    B=512/N=56). numpy packbits runs inside the prefetch thread — free."""
    if batch.adj.dtype != np.bool_:
        return batch
    return dataclasses.replace(batch, adj=np.packbits(batch.adj, axis=-1))


def _worth_packing(device) -> bool:
    """Bit-packing only pays where a host->device wire exists: on the CPU
    backend the 'transfer' is a copy in RAM and every jitted step would pay
    the unpack (shift/and/reshape) for nothing."""
    platform = device.platform if device is not None else jax.default_backend()
    return platform != "cpu"


def to_device(batch: SessionBatch, device=None) -> SessionBatch:
    """Move a host batch onto the (default) device as jax arrays (adjacency
    bit-packed for the wire on accelerator backends; unpacked lazily on
    device via dense_adj)."""
    if isinstance(batch, SessionBatch) and _worth_packing(device):
        batch = pack_adj(batch)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), device), batch)


def prefetch_to_device(iterator, size: int = 2, transfer=to_device,
                       transfer_workers: int = 1):
    """Iterate `iterator`, transferring `size` batches ahead on a background
    thread so host batch assembly and host->device copies overlap device
    compute (the reference relies on torch DataLoader workers for the same
    overlap, dataloader.py:235-241).

    transfer_workers > 1 runs the `transfer` calls on a thread pool while a
    futures queue preserves iterator order. Through a remote-TPU relay each
    device_put blocks its thread on an RPC round trip, so a single transfer
    thread SERIALIZES consecutive groups' transfers against each other —
    measured at the bench corpus this hid ~0.2 s/epoch behind one thread
    (docs/PERFORMANCE.md 'Host input pipeline').

    If the consumer abandons the generator early (break / exception / GC),
    a `stop` event set from the generator's close() unblocks the worker —
    it would otherwise park forever on q.put, leaking the thread plus up to
    `size` pinned device batches per abandoned epoch."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error: list[BaseException] = []
    stop = threading.Event()
    pool = (
        concurrent.futures.ThreadPoolExecutor(max_workers=transfer_workers)
        if transfer_workers > 1
        else None
    )

    def worker():
        try:
            for item in iterator:
                # pool mode: submit (non-blocking) and enqueue the future —
                # transfer errors surface at .result() in the consumer.
                payload = pool.submit(transfer, item) if pool else transfer(item)
                while not stop.is_set():
                    try:
                        q.put(payload, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to the consumer thread
            error.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    return
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item.result() if pool else item
    finally:
        # Reached on close()/GC of a part-consumed generator: release the
        # worker and drain so its pinned device batches drop promptly.
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        if pool:
            pool.shutdown(wait=False, cancel_futures=True)


# ---------------------------------------------------------------------------
# CSR graph + induced subgraphs
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CSRGraph:
    """Directed CSR adjacency over global item ids (rows sorted)."""

    indptr: np.ndarray  # [num_items + 1] int64
    indices: np.ndarray  # [num_edges] int32
    num_items: int


def build_csr(item_i, item_j, num_items: int) -> CSRGraph:
    """CSR from directed edges item_i -> item_j (duplicates preserved).

    The co-occurrence graph stores canonical (min, max) edges once
    (reference 04_build_graph.py:63-71); like the reference's subgraph
    builder we do NOT symmetrize — direction semantics are the model's
    concern, parity first."""
    item_i = np.asarray(item_i, dtype=np.int64)
    item_j = np.asarray(item_j, dtype=np.int64)
    order = np.lexsort((item_j, item_i))
    si, sj = item_i[order], item_j[order]
    counts = np.bincount(si, minlength=num_items)
    indptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSRGraph(indptr=indptr, indices=sj.astype(np.int32), num_items=num_items)


def induced_edges(graph: CSRGraph, nodes) -> tuple[np.ndarray, np.ndarray]:
    """Edges of the subgraph induced by `nodes` (sorted unique global ids).

    Returns (src_local, dst_local) int32 arrays indexing into `nodes`.
    Vectorized CSR row gather + searchsorted membership — replaces the
    reference's pandas isin over the full edge list (dataloader.py:126-154).
    """
    nodes = np.asarray(nodes, dtype=np.int64)
    empty = np.zeros(0, dtype=np.int32)
    if len(nodes) == 0:
        return empty, empty
    starts = graph.indptr[nodes]
    counts = graph.indptr[nodes + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return empty, empty
    # Flat positions of every CSR entry belonging to a row in `nodes`.
    row_offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = np.repeat(starts - row_offsets, counts) + np.arange(total)
    dst_items = graph.indices[flat].astype(np.int64)
    src_local = np.repeat(np.arange(len(nodes), dtype=np.int32), counts)
    pos = np.searchsorted(nodes, dst_items)
    ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == dst_items)
    return src_local[ok], pos[ok].astype(np.int32)


def sample_negatives(rng: np.random.Generator, exclude, num_items: int, k: int) -> np.ndarray:
    """k negatives from [1, num_items) excluding `exclude` (rejection
    sampling; duplicates among negatives allowed — reference
    dataloader.py:107-124 parity).

    Termination guard (the reference has none, dataloader.py:118-123): when
    the candidate range is empty (num_items <= 1) or the session covers
    nearly the whole catalog (tiny test datasets), rejection sampling can't
    terminate — after a bounded number of rounds we fall back to allowing
    in-session negatives rather than looping forever."""
    out = np.empty(k, dtype=np.int32)
    if num_items <= 1:
        out[:] = 0  # no valid candidate range; padding id (masked downstream)
        return out
    got = 0
    for _ in range(64):  # bounded rounds; ~certain success unless exclude ≈ catalog
        cands = rng.integers(1, num_items, size=max(2 * (k - got), 8))
        for c in cands:
            if int(c) not in exclude:
                out[got] = c
                got += 1
                if got == k:
                    return out
    # Degenerate catalog: permit in-session negatives (documented deviation).
    out[got:] = rng.integers(1, num_items, size=k - got)
    return out


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class SessionDataset:
    """Pre-indexed sessions + CSR graph (reference SessionDataset parity,
    dataloader.py:22-154, re-designed for zero per-sample pandas work).

    sessions: CSV path or DataFrame with columns session_id/timestamp/itemid.
    edges: (item_i, item_j) arrays (from data.graph.load_edges).
    Sessions are ordered by sorted session_id (reference groupby parity);
    each is time-sorted and truncated to the LAST max_session_length events.
    """

    def __init__(
        self,
        sessions,
        edges: tuple,
        num_negatives: int = 5,
        max_session_length: int = 50,
        num_items: int | None = None,
    ):
        import pandas as pd

        if isinstance(sessions, (str, Path)):
            df = pd.read_csv(sessions)
        else:
            df = sessions
        df = df.sort_values(["session_id", "timestamp"], kind="stable")

        self.num_negatives = num_negatives
        self.max_session_length = max_session_length

        codes, self.session_ids = pd.factorize(df["session_id"], sort=True)
        items_all = df["itemid"].to_numpy(np.int64)
        counts = np.bincount(codes, minlength=len(self.session_ids))
        ends_all = np.cumsum(counts)
        starts_all = ends_all - counts

        # Truncate to the last max_session_length events (vectorized).
        keep_len = np.minimum(counts, max_session_length)
        pos = np.arange(len(df)) - starts_all[codes]
        keep = pos >= (counts - keep_len)[codes]
        self.items = items_all[keep]
        self.offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(keep_len, out=self.offsets[1:])

        item_i, item_j = edges
        item_i = np.asarray(item_i, dtype=np.int64)
        item_j = np.asarray(item_j, dtype=np.int64)
        if num_items is None:
            # Reference parity: raw max id + 1 across sessions and edges
            # (dataloader.py:51-58) — NOT the count of connected nodes.
            num_items = int(
                max(
                    items_all.max(initial=0),
                    item_i.max(initial=0),
                    item_j.max(initial=0),
                )
            ) + 1
        self.num_items = num_items
        self.graph = build_csr(item_i, item_j, num_items)

        # Per-session unique-context-node counts (bucket assignment),
        # vectorized: lexsort (session, item) then count segment-uniques.
        ctx_sess = np.repeat(np.arange(len(counts)), np.maximum(keep_len - 1, 0))
        last_of = self.offsets[1:] - 1
        ctx_mask = np.ones(len(self.items), dtype=bool)
        ctx_mask[last_of[keep_len > 0]] = False
        ctx_items = self.items[ctx_mask]
        if len(ctx_items):
            order = np.lexsort((ctx_items, ctx_sess))
            s, it = ctx_sess[order], ctx_items[order]
            new = np.ones(len(s), dtype=bool)
            new[1:] = (s[1:] != s[:-1]) | (it[1:] != it[:-1])
            self.unique_counts = np.bincount(s[new], minlength=len(counts)).astype(np.int32)
        else:
            self.unique_counts = np.zeros(len(counts), dtype=np.int32)

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def session_items(self, idx: int) -> np.ndarray:
        """Time-ordered (truncated) item ids of session `idx`."""
        return self.items[self.offsets[idx] : self.offsets[idx + 1]]

    def sample(self, idx: int, rng: np.random.Generator) -> dict:
        """One training sample: sorted-unique context nodes, induced local
        edges, last event as target, rejection-sampled negatives."""
        items = self.session_items(idx)
        target = int(items[-1])
        nodes = np.unique(items[:-1])
        src, dst = induced_edges(self.graph, nodes)
        negatives = sample_negatives(
            rng, set(items.tolist()), self.num_items, self.num_negatives
        )
        return {
            "nodes": nodes.astype(np.int32),
            "edge_src": src,
            "edge_dst": dst,
            "target": target,
            "negatives": negatives,
        }


# ---------------------------------------------------------------------------
# Collate + epoch iteration
# ---------------------------------------------------------------------------


def collate(samples: list, bucket_n: int, num_negatives: int) -> SessionBatch:
    """Assemble fixed-shape arrays from per-session samples (None = padding
    slot). Nodes beyond bucket_n are truncated with their edges dropped
    (never triggered at max_session_length=50 with the default buckets)."""
    B = len(samples)
    node_ids = np.zeros((B, bucket_n), dtype=np.int32)
    node_mask = np.zeros((B, bucket_n), dtype=bool)
    adj = np.zeros((B, bucket_n, bucket_n), dtype=bool)
    num_nodes = np.zeros(B, dtype=np.int32)
    targets = np.zeros(B, dtype=np.int32)
    negatives = np.zeros((B, num_negatives), dtype=np.int32)
    sample_mask = np.zeros(B, dtype=bool)

    for b, s in enumerate(samples):
        if s is None:
            continue
        nodes = np.asarray(s["nodes"])[:bucket_n]
        n = len(nodes)
        node_ids[b, :n] = nodes
        node_mask[b, :n] = True
        num_nodes[b] = n
        src = np.asarray(s["edge_src"])
        dst = np.asarray(s["edge_dst"])
        if len(src):
            ok = (src < n) & (dst < n)
            adj[b, dst[ok], src[ok]] = True
        targets[b] = s["target"]
        negatives[b] = np.asarray(s["negatives"])[:num_negatives]
        sample_mask[b] = True

    return SessionBatch(
        node_ids=node_ids,
        node_mask=node_mask,
        adj=adj,
        num_nodes=num_nodes,
        targets=targets,
        negatives=negatives,
        sample_mask=sample_mask,
    )


# Sentinel for unused uid slots: out of range of any table, dropped by
# scatters (mode="drop") and by the fused kernel's searchsorted ranges.
UID_SENTINEL = np.int32(2**31 - 1)

# The unique-row count is bucketed so summed-gradient shapes stay static
# per (batch shape, bucket) pair — few compiles, small scatters.
UNIQUE_BUCKETS = (1024, 2048, 4096, 8192, 16384, 32768, 65536)


class GradIndex(NamedTuple):
    """Host-precomputed index for sparse embedding gradients.

    The sparse train step differentiates w.r.t. the gathered embedding rows
    only; turning those row grads into per-unique-id sums needs a sort —
    which costs ~1.6 ms/step on TPU (bitonic) but microseconds on the host,
    where the ids are already sitting in the batch. Fields (R = B*(N+1+K),
    U = unique-count bucket):

    ids  [R] — concat(node_ids.flat, targets, negatives.flat)
    perm [R] — stable argsort of ids
    seg  [R] — segment number of each sorted slot (equal ids share one)
    uid  [U] — ascending unique ids, UID_SENTINEL-padded tail (U >= uniques)
    """

    ids: np.ndarray
    perm: np.ndarray
    seg: np.ndarray
    uid: np.ndarray


def make_grad_index(batch: SessionBatch) -> GradIndex:
    """Build the sparse-gradient index on the host (numpy) from a host batch."""
    ids = np.concatenate(
        [
            np.asarray(batch.node_ids).reshape(-1),
            np.asarray(batch.targets),
            np.asarray(batch.negatives).reshape(-1),
        ]
    ).astype(np.int32)
    return make_grad_index_from_ids(ids)


def make_grad_index_from_ids(ids: np.ndarray) -> GradIndex:
    """GradIndex from a raw id list (multi-host path: ids cover the GLOBAL
    batch, reconstructed identically on every process — see
    parallel/distributed.py and GlobalBatchMeta)."""
    ids = np.asarray(ids, dtype=np.int32)
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    sid = ids[perm]
    is_new = np.ones(len(sid), dtype=bool)
    is_new[1:] = sid[1:] != sid[:-1]
    seg = (np.cumsum(is_new) - 1).astype(np.int32)
    num_unique = int(seg[-1]) + 1 if len(seg) else 0
    U = next((b for b in UNIQUE_BUCKETS if num_unique <= b), len(ids))
    U = min(U, len(ids)) if len(ids) else 1
    uid = np.full(U, UID_SENTINEL, np.int32)
    uid[seg] = sid  # ascending uniques (sid is sorted), sentinel tail
    return GradIndex(ids=ids, perm=perm, seg=seg, uid=uid)


def stack_batches(batches: list) -> "SessionBatch":
    """Stack C same-shape host batches into one [C, ...] batch (the payload
    of a chained train step — train/trainer.make_chained_sparse_train_step).
    One host->device transfer and ONE dispatch then cover C optimizer steps,
    which matters through remote-TPU relays where per-dispatch latency is
    the e2e bottleneck (docs/PERFORMANCE.md 'Step chaining')."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def stack_grad_indices(gidxs: list) -> "GradIndex":
    """Stack C GradIndexes to [C, ...], padding every uid to the group's
    largest unique-count bucket (sentinel tail rows scatter nowhere, so
    padding only costs a few extra zero rows in the summed-gradient
    buffer)."""
    U = max(g.uid.shape[0] for g in gidxs)

    def pad_uid(u: np.ndarray) -> np.ndarray:
        out = np.full(U, UID_SENTINEL, np.int32)
        out[: len(u)] = u
        return out

    return GradIndex(
        ids=np.stack([g.ids for g in gidxs]),
        perm=np.stack([g.perm for g in gidxs]),
        seg=np.stack([g.seg for g in gidxs]),
        uid=np.stack([pad_uid(g.uid) for g in gidxs]),
    )


def chain_iterator(iterator, chain: int):
    """Group consecutive epoch items into runs of `chain` with equal node
    bucket (iterate_batches yields buckets in ascending order, so runs are
    long). Yields lists of items; a partial run at a bucket boundary or
    epoch end is yielded as-is (callers fall back to single steps for it,
    keeping the compiled-shape count at 2 per bucket: chain-C and chain-1).
    """
    pending: list = []
    pending_n = None
    for item in iterator:
        batch = item[0] if isinstance(item, tuple) else item
        n = batch.nodes_per_session
        if pending and n != pending_n:
            yield pending
            pending = []
        pending.append(item)
        pending_n = n
        if len(pending) == chain:
            yield pending
            pending = []
    if pending:
        yield pending


def _resolve_engine(engine: str) -> str:
    if engine == "auto":
        from gat_recommendation_tpu.data import native

        return "native" if native.available() else "numpy"
    if engine not in ("numpy", "native"):
        raise ValueError(f"Unknown batching engine: {engine}")
    return engine


# ---------------------------------------------------------------------------
# Deterministic per-slot negative RNG
#
# Negatives are keyed by (seed, batch_index, GLOBAL slot) so that (a) any
# process can reconstruct any other process's negatives for the multi-host
# GradIndex (parallel/distributed.py), and (b) batch assembly parallelizes
# (no shared sequential RNG stream). numpy engine: a PCG substream per slot.
# native engine: the C SplitMix64 scheme, mirrored in numpy below.
# ---------------------------------------------------------------------------


def _slot_rng(seed: int, batch_index: int, gslot: int) -> np.random.Generator:
    return np.random.default_rng([seed, batch_index, gslot])


def _native_batch_seed(seed: int, batch_index: int) -> int:
    """Per-batch seed for the C engine. The same seed is used by EVERY
    process of a multi-host run; per-slot streams are derived inside the
    engine from (seed, GLOBAL slot) via the slot_offset argument, so
    concat(local batches) is bit-identical to a single-process assembly."""
    return int((np.uint64(seed) << np.uint64(20)) + np.uint64(batch_index))


def _splitmix64(state: np.uint64) -> tuple[np.uint64, np.uint64]:
    """One SplitMix64 draw (numpy mirror of native/batcher.cpp:25-30)."""
    with np.errstate(over="ignore"):
        state = state + np.uint64(0x9E3779B97F4A7C15)
        z = state
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return state, z ^ (z >> np.uint64(31))


def _native_negatives(batch_seed: int, gslot: int, session_items, num_items: int, k: int) -> np.ndarray:
    """Reproduce the C engine's negatives for one GLOBAL slot (the engine
    derives its per-slot stream from seed ^ golden*(slot_offset+local+1) =
    seed ^ golden*(gslot+1) — batcher.cpp assemble_batch)."""
    out = np.zeros(k, dtype=np.int32)
    if num_items <= 1:
        return out
    uniq = set(int(x) for x in session_items)
    with np.errstate(over="ignore"):
        state = np.uint64(batch_seed) ^ (
            np.uint64(0x9E3779B97F4A7C15) * np.uint64(gslot + 1)
        )
    got, attempts, max_attempts = 0, 0, 128 * k
    while got < k and attempts < max_attempts:
        attempts += 1
        state, z = _splitmix64(state)
        cand = 1 + int(z % np.uint64(num_items - 1))
        if cand in uniq:
            continue
        out[got] = cand
        got += 1
    while got < k:  # degenerate catalog fallback (matches C)
        state, z = _splitmix64(state)
        out[got] = 1 + int(z % np.uint64(num_items - 1))
        got += 1
    return out


class GlobalBatchMeta(NamedTuple):
    """Global-batch facts every process can compute without the heavy
    assembly (adjacency/edges) of remote rows — used in multi-host training
    for metrics and for the replicated GradIndex.

    targets     [B_global] int32
    sample_mask [B_global] bool
    ids         [R_global] int32 or None — concat(node_ids.flat, targets,
                negatives.flat) of the GLOBAL batch (None unless requested)
    """

    targets: np.ndarray
    sample_mask: np.ndarray
    ids: np.ndarray | None


def _global_batch_meta(
    dataset: SessionDataset,
    chunk: list,
    batch_size: int,
    bucket_n: int,
    seed: int,
    batch_index: int,
    engine: str,
    process_count: int,
    with_ids: bool,
) -> GlobalBatchMeta:
    """Reconstruct global-batch metadata (cheap: no CSR/adjacency work)."""
    B = batch_size
    K = dataset.num_negatives
    targets = np.zeros(B, dtype=np.int32)
    sample_mask = np.zeros(B, dtype=bool)
    ids = None
    if with_ids:
        node_ids = np.zeros((B, bucket_n), dtype=np.int32)
        negatives = np.zeros((B, K), dtype=np.int32)
    local = batch_size // process_count
    for g, idx in enumerate(chunk):
        items = dataset.session_items(idx)
        targets[g] = items[-1]
        sample_mask[g] = True
        if with_ids:
            nodes = np.unique(items[:-1])[:bucket_n]
            node_ids[g, : len(nodes)] = nodes
            if engine == "native":
                bs = _native_batch_seed(seed, batch_index)
                negatives[g] = _native_negatives(bs, g, items, dataset.num_items, K)
            else:
                negatives[g] = sample_negatives(
                    _slot_rng(seed, batch_index, g),
                    set(items.tolist()),
                    dataset.num_items,
                    K,
                )
    if with_ids:
        ids = np.concatenate(
            [node_ids.reshape(-1), targets, negatives.reshape(-1)]
        ).astype(np.int32)
    return GlobalBatchMeta(targets=targets, sample_mask=sample_mask, ids=ids)


def iterate_batches(
    dataset: SessionDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    engine: str = "auto",
    buckets=DEFAULT_BUCKETS,
    process_index: int = 0,
    process_count: int = 1,
    with_global_meta: bool = False,
    with_global_ids: bool = False,
    workers: int = 0,
):
    """Yield SessionBatches covering one epoch.

    Sessions are grouped by node-count bucket (ascending bucket order, each
    bucket's sessions in epoch-shuffled order); every batch has exactly
    `batch_size` slots, remainders padded with masked samples. Both engines
    produce identical grouping/shapes; negatives differ by RNG stream
    (numpy PCG vs native SplitMix64 — statistically equivalent).

    Multi-host: `batch_size` is the GLOBAL batch size; the grouping is a
    pure function of (dataset, seed) so every process computes the identical
    schedule, and process p assembles only rows [p*local, (p+1)*local) of
    each global batch (local = batch_size / process_count). With
    `with_global_meta` (implied by process_count > 1) each yield becomes
    (local_batch, GlobalBatchMeta); `with_global_ids` additionally fills
    meta.ids for the replicated multi-host GradIndex. BOTH engines key
    negatives by GLOBAL slot (numpy: a PCG substream per slot; native: the C
    engine's slot_offset argument), so the concatenation of all processes'
    local batches is bit-identical to the process_count=1 batch (asserted by
    __graft_entry__.dryrun_multichip, tests/test_multihost.py, and
    tests/test_native_batcher.py's multi-process cases).

    workers > 0 assembles batches on a thread pool (bounded in-flight
    window, order preserved). The C++ engine releases the GIL during
    assembly, so this scales near-linearly and is how the host keeps up
    with the TPU step rate (bench.py --e2e; the reference used torch
    DataLoader worker PROCESSES for the same purpose, dataloader.py:235-241).
    Determinism is unchanged: every batch's content is a pure function of
    (seed, batch_index, slot), never of assembly order.
    """
    engine = _resolve_engine(engine)
    assert batch_size % process_count == 0, (
        f"global batch size {batch_size} must divide by process count {process_count}"
    )
    assert 0 <= process_index < process_count
    local = batch_size // process_count
    with_global_meta = with_global_meta or process_count > 1 or with_global_ids
    # Invariant: a session truncated to max_session_length events has at most
    # max_session_length - 1 unique context nodes; the largest bucket must
    # hold them or `collate` would silently drop nodes (and their edges).
    # Extend the ladder dynamically for non-default --max-session-length.
    need = max(int(dataset.max_session_length) - 1, 1)
    if buckets[-1] < need:
        buckets = tuple(buckets) + (-(-need // 8) * 8,)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))

    by_bucket: dict[int, list[int]] = {b: [] for b in buckets}
    for i in order:
        by_bucket[pick_bucket(int(dataset.unique_counts[i]), buckets)].append(int(i))

    if engine == "native":
        from gat_recommendation_tpu.data import native

    schedule = []
    batch_index = 0
    for bucket_n in buckets:
        idxs = by_bucket[bucket_n]
        for lo in range(0, len(idxs), batch_size):
            schedule.append((idxs[lo : lo + batch_size], bucket_n, batch_index))
            batch_index += 1

    def build(item):
        chunk, bucket_n, bi = item
        local_chunk = chunk[process_index * local : (process_index + 1) * local]
        if engine == "native":
            batch = native.assemble_batch(
                dataset, local_chunk, local, bucket_n,
                _native_batch_seed(seed, bi),
                slot_offset=process_index * local,
            )
        else:
            samples = [
                dataset.sample(i, _slot_rng(seed, bi, process_index * local + s))
                for s, i in enumerate(local_chunk)
            ]
            samples += [None] * (local - len(local_chunk))
            batch = collate(samples, bucket_n, dataset.num_negatives)
        if with_global_meta:
            meta = _global_batch_meta(
                dataset, chunk, batch_size, bucket_n, seed, bi,
                engine, process_count, with_global_ids,
            )
            return batch, meta
        return batch

    if workers <= 0:
        for item in schedule:
            yield build(item)
        return

    # Thread-pool assembly with a bounded in-flight window (order preserved;
    # an unbounded executor.map would materialize the whole epoch in RAM).
    import collections
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        inflight: collections.deque = collections.deque()
        it = iter(schedule)
        try:
            for item in it:
                inflight.append(ex.submit(build, item))
                if len(inflight) >= 2 * workers:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()
        finally:
            for f in inflight:
                f.cancel()

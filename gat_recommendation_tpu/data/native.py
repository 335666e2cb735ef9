"""ctypes bindings for the C++ batch-assembly engine (native/batcher.cpp).

The host input pipeline is the framework's real bottleneck at TPU step rates
(SURVEY.md §7 hard part #7). `available()` lazily loads native/libbatcher.so,
attempting a one-shot `make -C native` build if the library is absent and a
toolchain exists; all callers fall back to the numpy engine on failure.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libbatcher.so"

_lib = None
_load_attempted = False
_load_lock = threading.Lock()  # assembly runs on thread pools (iterate_batches)


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _load():
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    return _load_locked()


def _load_locked():
    global _lib, _load_attempted
    with _load_lock:
        if _lib is not None or _load_attempted:
            return _lib
        return _do_load()


def _do_load():
    # Runs under _load_lock. _load_attempted is set only AFTER _lib is
    # assigned (or the load definitively failed), so the unlocked fast path
    # in _load() can never observe attempted=True with the lib mid-load.
    global _lib, _load_attempted
    # Always (re)run make: the target depends on batcher.cpp, so this is a
    # ~10 ms no-op when the library is current but prevents a stale .so from
    # silently mismatching the Python-side ABI after a source change.
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "libbatcher.so"],
            capture_output=True,
            timeout=120,
            check=True,
        )
    except Exception:
        if not _LIB_PATH.exists():
            _load_attempted = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_attempted = True
        return None
    lib.build_csr.restype = None
    lib.build_csr.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.assemble_batch.restype = None
    lib.assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64),  # items_all (dataset flat items)
        ctypes.POINTER(ctypes.c_int64),  # offsets_all (dataset per-session)
        ctypes.POINTER(ctypes.c_int64),  # sess_idx
        ctypes.c_int64,  # n_sel
        ctypes.c_int64,  # batch_size
        ctypes.POINTER(ctypes.c_int64),  # indptr
        ctypes.POINTER(ctypes.c_int32),  # indices
        ctypes.c_int64,  # num_items
        ctypes.c_int64,  # bucket_n
        ctypes.c_int64,  # num_negatives
        ctypes.c_uint64,  # seed
        ctypes.c_int64,  # slot_offset (global slot of local row 0)
        ctypes.POINTER(ctypes.c_int32),  # node_ids
        ctypes.POINTER(ctypes.c_uint8),  # node_mask
        ctypes.POINTER(ctypes.c_uint8),  # adj
        ctypes.POINTER(ctypes.c_int32),  # num_nodes
        ctypes.POINTER(ctypes.c_int32),  # targets
        ctypes.POINTER(ctypes.c_int32),  # negatives
        ctypes.POINTER(ctypes.c_uint8),  # sample_mask
    ]
    _configure_scorer(lib)
    _lib = lib
    _load_attempted = True
    return _lib


def _configure_scorer(lib) -> None:
    """argtypes for the serving-side int8 scorer (native/scorer.cpp) —
    shared by the default load and alternate-ISA test builds."""
    lib.quantize_table.restype = None
    lib.quantize_table.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # table f32 [V*D]
        ctypes.c_int64,  # V
        ctypes.c_int32,  # D
        ctypes.POINTER(ctypes.c_int8),  # q out [V*D]
        ctypes.POINTER(ctypes.c_float),  # scale out [V]
        ctypes.POINTER(ctypes.c_int32),  # rowsum out [V]
    ]
    lib.score_int8_topl.restype = None
    lib.score_int8_topl.argtypes = [
        ctypes.POINTER(ctypes.c_int8),  # q
        ctypes.POINTER(ctypes.c_float),  # scale
        ctypes.POINTER(ctypes.c_int32),  # rowsum
        ctypes.c_int64,  # V
        ctypes.c_int32,  # D
        ctypes.POINTER(ctypes.c_int8),  # sess_q [D]
        ctypes.c_float,  # sess_scale
        ctypes.POINTER(ctypes.c_uint8),  # seen mask [V] or NULL
        ctypes.c_int32,  # L
        ctypes.c_int32,  # n_threads
        ctypes.POINTER(ctypes.c_int64),  # out_idx [L]
        ctypes.POINTER(ctypes.c_float),  # out_score [L]
    ]


def load_scorer_variant(target: str):
    """Build and load an alternate-ISA scorer (e.g. 'libbatcher_avx2.so',
    which pins the non-VNNI AVX2 fallback so tests can exercise it on VNNI
    hosts). Returns a configured ctypes lib, or None without a toolchain."""
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), target],
            capture_output=True, timeout=120, check=True,
        )
        lib = ctypes.CDLL(str(_NATIVE_DIR / target))
    except Exception:
        return None
    _configure_scorer(lib)
    return lib


def available() -> bool:
    return _load() is not None


def build_csr(item_i, item_j, num_items: int) -> tuple[np.ndarray, np.ndarray]:
    """Native CSR build: returns (indptr int64 [V+1], indices int32 [E])."""
    lib = _load()
    assert lib is not None, "libbatcher.so unavailable"
    item_i = np.ascontiguousarray(item_i, dtype=np.int64)
    item_j = np.ascontiguousarray(item_j, dtype=np.int64)
    indptr = np.zeros(num_items + 1, dtype=np.int64)
    indices = np.zeros(len(item_i), dtype=np.int32)
    lib.build_csr(
        _i64p(item_i), _i64p(item_j), len(item_i), num_items, _i64p(indptr), _i32p(indices)
    )
    return indptr, indices


def assemble_batch(
    dataset, chunk: list, batch_size: int, bucket_n: int, seed: int, slot_offset: int = 0
):
    """Assemble one fixed-shape SessionBatch for session indices `chunk`
    (padded with empty slots to batch_size) via the C++ engine.

    slot_offset is the GLOBAL slot index of local row 0 (multi-host feeding:
    process p passes p * local_batch), keying the per-slot negative RNG so
    concatenated local batches equal the single-process assembly."""
    from gat_recommendation_tpu.data.batching import SessionBatch

    lib = _load()
    assert lib is not None, "libbatcher.so unavailable"

    # The C engine indexes the dataset's flat (items, offsets) arrays
    # directly via the selected session indices — no per-batch copies.
    sess_idx = np.ascontiguousarray(chunk, dtype=np.int64)

    K = dataset.num_negatives
    node_ids = np.zeros((batch_size, bucket_n), dtype=np.int32)
    node_mask = np.zeros((batch_size, bucket_n), dtype=np.uint8)
    adj = np.zeros((batch_size, bucket_n, bucket_n), dtype=np.uint8)
    num_nodes = np.zeros(batch_size, dtype=np.int32)
    targets = np.zeros(batch_size, dtype=np.int32)
    negatives = np.zeros((batch_size, K), dtype=np.int32)
    sample_mask = np.zeros(batch_size, dtype=np.uint8)

    lib.assemble_batch(
        _i64p(dataset.items),
        _i64p(dataset.offsets),
        _i64p(sess_idx),
        len(sess_idx),
        batch_size,
        _i64p(dataset.graph.indptr),
        _i32p(dataset.graph.indices),
        dataset.num_items,
        bucket_n,
        K,
        ctypes.c_uint64(seed),
        ctypes.c_int64(slot_offset),
        _i32p(node_ids),
        _u8p(node_mask),
        _u8p(adj),
        _i32p(num_nodes),
        _i32p(targets),
        _i32p(negatives),
        _u8p(sample_mask),
    )
    return SessionBatch(
        node_ids=node_ids,
        node_mask=node_mask.astype(bool),
        adj=adj.astype(bool),
        num_nodes=num_nodes,
        targets=targets,
        negatives=negatives,
        sample_mask=sample_mask.astype(bool),
    )


# -- serving-side int8 scorer (native/scorer.cpp) ---------------------------


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def quantize_table(table: np.ndarray, lib=None):
    """Per-row int8 quantization of a [V, D] f32 table.

    Returns (q int8 [V, D], scale f32 [V], rowsum int32 [V]); row i
    dequantizes as q[i] * scale[i], rowsum feeds the unsigned-bias
    correction inside score_int8_topl.
    """
    lib = lib if lib is not None else _load()
    assert lib is not None, "libbatcher.so unavailable"
    table = np.ascontiguousarray(table, dtype=np.float32)
    V, D = table.shape
    q = np.empty((V, D), np.int8)
    scale = np.empty(V, np.float32)
    rowsum = np.empty(V, np.int32)
    lib.quantize_table(_f32p(table), V, D, _i8p(q), _f32p(scale), _i32p(rowsum))
    return q, scale, rowsum


def score_int8_topl(
    q: np.ndarray,
    scale: np.ndarray,
    rowsum: np.ndarray,
    sess: np.ndarray,
    L: int,
    seen: np.ndarray | None = None,
    n_threads: int = 2,
    lib=None,
):
    """Top-L candidate rows of `q` by approximate (int8) dot score with the
    f32 query vector `sess`. Returns (idx int64 [<=L], approx_score f32);
    rows with seen[i]=True or all-zero rows are excluded. Callers re-rank
    the candidates exactly in f32 (serving/recommender.py)."""
    lib = lib if lib is not None else _load()
    assert lib is not None, "libbatcher.so unavailable"
    V, D = q.shape
    sess = np.ascontiguousarray(sess, dtype=np.float32).reshape(D)
    s_sess = float(np.abs(sess).max()) / 127.0
    sess_q = (
        np.round(sess / s_sess).clip(-127, 127).astype(np.int8)
        if s_sess > 0
        else np.zeros(D, np.int8)
    )
    out_idx = np.empty(L, np.int64)
    out_score = np.empty(L, np.float32)
    seen_p = _u8p(seen) if seen is not None else None
    lib.score_int8_topl(
        _i8p(q), _f32p(scale), _i32p(rowsum), V, D,
        _i8p(sess_q), ctypes.c_float(s_sess), seen_p,
        L, n_threads, _i64p(out_idx), _f32p(out_score),
    )
    keep = out_idx >= 0
    return out_idx[keep], out_score[keep]

"""Multi-host (multi-process) training support.

The reference is strictly single-GPU (SURVEY.md §2.4 — no DDP/collectives
anywhere); multi-host is this framework's north-star extension (SURVEY.md §7
step 7). Design for JAX's multi-controller model:

  * every process calls `initialize()` (jax.distributed) before any other
    JAX API, so `jax.devices()` is the GLOBAL device list and a Mesh built
    from it spans hosts — ICI within a slice, DCN across slices;
  * the per-epoch bucket grouping in `iterate_batches` is a pure function of
    (dataset, seed), so every process computes the IDENTICAL global batch
    schedule; process p assembles only rows [p*B_local, (p+1)*B_local) of
    each global batch (`host_shard`) and `make_global_batch` binds the local
    rows to the global sharded array via
    jax.make_array_from_process_local_data — each process feeds exactly its
    addressable shard, and all processes join every collective in the same
    order (a requirement of the multi-controller model);
  * metrics/eval outputs sharded over 'data' are not fully addressable on
    any single host — `allgather_metrics_inputs` gathers them so every
    process computes identical metrics and makes the same early-stop
    decision;
  * checkpoints: Orbax array saves are collective (each process writes its
    shards); the meta.json sidecar is written by process 0 only.

Single-process behavior is the identity: process_count() == 1 makes every
helper a no-op/fast-path, so the same Trainer code path serves both.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when a multi-process launch is detected.

    Detection: explicit args, or standard env (JAX_COORDINATOR_ADDRESS /
    COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID, as set by the Vertex
    multi-replica worker pool in scripts/gcp/04_submit_training.sh), or a
    TPU pod runtime (where jax.distributed.initialize() autodetects). On
    single-process launches this is a no-op returning False.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS")
    )
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    # Vertex AI CLUSTER_SPEC / TPU pod metadata also work via autodetection —
    # but only a MULTI-worker pod counts (single-chip runtimes, e.g. relayed
    # dev chips, export TPU_WORKER_HOSTNAMES=localhost and must stay
    # single-process).
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    autodetect = ("," in hostnames) or os.environ.get("CLUSTER_SPEC")
    if coordinator_address is None and not autodetect:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # incomplete pod metadata etc.
        import logging

        logging.getLogger(__name__).warning(
            "multi-process launch detected but jax.distributed.initialize "
            "failed (%s); continuing single-process", e
        )
        return False
    _initialized = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (logs, meta.json)."""
    return jax.process_index() == 0


def host_shard(chunk: list, batch_size: int, pindex: int, pcount: int) -> tuple[list, int]:
    """Rows of one GLOBAL batch owned by process `pindex`.

    `chunk` is the (possibly short, end-of-bucket) list of session indices
    for a global batch of `batch_size` slots. Returns (local_chunk,
    local_batch_size): the session indices landing in this process's row
    range [pindex*local, (pindex+1)*local); short chunks pad exactly like
    the single-process path because slot b of the global batch is slot
    b - pindex*local of local batch pindex.
    """
    assert batch_size % pcount == 0, (
        f"global batch size {batch_size} must divide by process count {pcount}"
    )
    local = batch_size // pcount
    lo = pindex * local
    return chunk[lo : lo + local], local


def make_global_batch(local_batch, mesh, pcount: int | None = None):
    """Bind this process's local batch rows into the global sharded batch.

    Every leaf is sharded over 'data' on axis 0; the global batch size is
    local_rows * process_count. Uses jax.make_array_from_process_local_data,
    which requires the 'data' axis of the mesh to be distributed across
    processes in index order (true for meshes built from jax.devices()).
    """
    from gat_recommendation_tpu.parallel.mesh import batch_sharding

    pcount = pcount if pcount is not None else jax.process_count()
    if pcount == 1:
        from gat_recommendation_tpu.parallel.steps import shard_batch

        return shard_batch(local_batch, mesh)
    from gat_recommendation_tpu.data.batching import SessionBatch, _worth_packing, pack_adj

    if isinstance(local_batch, SessionBatch) and _worth_packing(mesh.devices.flat[0]):
        local_batch = pack_adj(local_batch)
    sharding = batch_sharding(mesh)

    def bind(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * pcount,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(bind, local_batch)


def make_global_chained_batch(local_stacked, mesh, pcount: int | None = None):
    """Bind this process's stacked [C, B_local, ...] chain group into the
    global chained batch ([C, B_local*pcount, ...], chain axis replicated,
    batch axis sharded over 'data').

    chain_iterator's grouping is a pure function of the (deterministic)
    epoch iteration, so every process forms the SAME chain groups and binds
    element c of the group to the same global step — the chained sharded
    step then runs one lax.scan over the global arrays on all processes.
    """
    from gat_recommendation_tpu.parallel.mesh import chained_batch_sharding

    pcount = pcount if pcount is not None else jax.process_count()
    if pcount == 1:
        from gat_recommendation_tpu.parallel.steps import shard_chained_batch

        return shard_chained_batch(local_stacked, mesh)
    from gat_recommendation_tpu.data.batching import SessionBatch, _worth_packing, pack_adj

    if isinstance(local_stacked, SessionBatch) and _worth_packing(mesh.devices.flat[0]):
        local_stacked = pack_adj(local_stacked)
    sharding = chained_batch_sharding(mesh)

    def bind(x):
        x = np.asarray(x)
        global_shape = (x.shape[0], x.shape[1] * pcount) + x.shape[2:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(bind, local_stacked)


def allgather_pytree(tree):
    """Gather per-process shards of every leaf onto all hosts (numpy out).

    No-op (device->host copy only) in single-process mode. Used for eval
    outputs so all processes compute identical metrics and agree on
    early-stopping.
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)), tree
    )

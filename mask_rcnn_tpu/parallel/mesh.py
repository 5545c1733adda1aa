"""Data-parallel training over a jax.sharding.Mesh.

This replaces the reference's entire ChainerMN stack (SURVEY.md §2.6):
  * `chainermn.create_communicator('hierarchical')` (NCCL+MPI, one process
    per GPU, mpirun launcher)            -> a single-program Mesh over all
    local/global devices;
  * `create_multi_node_optimizer` gradient allreduce -> the psum XLA inserts
    when the batch axis is sharded and params are replicated;
  * `scatter_dataset`                     -> deterministic per-host slicing in
    the data loader (data/loader.py);
  * `comm.rank == 0` gating               -> `jax.process_index() == 0`.

Multi-host: call `jax.distributed.initialize()` before anything else; the
same code then runs over ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded.

    Single process: a plain sharded device_put. Multi-host (global mesh):
    each process contributes its *local* batch as one shard of the global
    array — the jax replacement for chainermn.scatter_dataset +
    per-rank batches (SURVEY.md §2.6)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)
        ),
        batch,
    )


def make_parallel_train_step(step_fn, mesh: Mesh):
    """jit the train step with params/opt-state replicated and the batch
    sharded along 'data'. XLA inserts the gradient all-reduce (psum) over
    ICI — no explicit collectives needed.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_parallel_predict_step(predict_fn, mesh: Mesh):
    """jit inference with the image batch sharded along 'data' and params
    replicated — multi-chip serving. Batch 1 per chip is already this
    model's throughput-optimal point (DESIGN.md), so an N-chip mesh fed
    N-image batches scales linearly with zero cross-chip traffic (no
    collectives: every output shard depends only on its input shard).

    ``predict_fn(params, images, sizes, scales) -> dict`` — e.g. a
    ``functools.partial`` of ``models.predict_step`` closing over the
    config.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        predict_fn,
        in_shardings=(rep, data, data, data),
        out_shardings=data,
    )


def process_zero() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Deterministic per-host shard of a global batch (replaces
    chainermn.scatter_dataset). The batch must divide evenly: silently
    flooring would leave the remainder examples unassigned to any host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} does not divide over {pc} "
            f"processes — the last {global_batch % pc} example(s) would "
            "never be assigned to any host"
        )
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)

"""Device-mesh data parallelism (global-view jit over a sharded batch).

TPU-native replacement for the reference's DDP plumbing (DistributedDataParallel
+ DistributedSampler + mp.spawn + NCCL process groups, reference
main_pretrain.py:319, main_finetune_cls_ddp.py:187-196,488, utils/misc.py:239-271):

- one ``Mesh(('data',))`` over all chips (multi-host via
  ``jax.distributed.initialize`` before mesh creation — the JAX runtime owns
  process-group setup);
- parameters/optimizer state replicated, batches sharded on 'data';
- jitting the global-view step makes XLA insert the gradient psums /
  contrastive-key all-gathers over ICI automatically — there is no
  ``concat_all_gather`` or ``all_reduce_mean`` to call (reference
  pr_hub_model.py:248-259, utils/misc.py:406-414 dissolve into the
  partitioner).

The mesh axis layout reserves room for future 'model' axes (TP) but the
reference workload (<= ViT-B, 196 tokens) needs only DP — see SURVEY §2.1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Activate the multi-host runtime when the standard env vars are set.

    The TPU-native replacement for the reference's init_process_group /
    MASTER_ADDR plumbing (utils/misc.py:239-271): when
    ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or a cluster environment jax auto-detects) is present, call
    ``jax.distributed.initialize()`` once so ``jax.devices()`` spans every
    host's chips and ``make_mesh()`` builds the global mesh. Each host then
    feeds its slice of the batch via ``HostShardedSource``. No-op (returns
    False) on single-host runs. Call before any other jax API touches the
    backend.
    """
    import os

    addr = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not addr:
        return False  # single-host: never touch the backend here
    # jax.distributed.initialize() must run BEFORE anything initializes the
    # XLA backend — so no jax.process_count() probe here (it would
    # initialize the backend and make initialize() raise). If a prior call
    # already initialized the client, initialize() raising tells us so.
    # jax reads only JAX_COORDINATOR_ADDRESS from env; the process
    # topology vars must be passed explicitly.
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
    except RuntimeError as e:
        # jax 0.9 raises "distributed.initialize should only be called
        # once." on a repeat call; older versions said "already
        # initialized" — treat both as the idempotent success path.
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return True
        raise
    if verbose:
        print(
            f"[mesh] jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = "data"
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def local_batch_size(global_batch_size: int) -> int:
    """Per-host slice of the global ``--batch_size``.

    Multi-host data parallelism keeps the reference's DistributedSampler
    semantics (each rank loads 1/world of every global batch,
    main_pretrain.py:218): each host's pipeline assembles
    ``global/process_count`` samples and :func:`shard_batch` glues the
    per-host slices into one global array. Identity on single-host runs.
    """
    n = jax.process_count()
    if n == 1:
        return global_batch_size
    assert global_batch_size % n == 0, (
        f"--batch_size {global_batch_size} must be a multiple of the "
        f"{n}-host process count"
    )
    return global_batch_size // n


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Place a host batch pytree with the leading dim sharded over the mesh.

    Scalars and leaves whose leading dim does not divide the mesh (e.g.
    per-batch ``num_valid`` counters) are replicated instead.

    Multi-host: each process passes its LOCAL slice of the batch
    (``local_batch_size`` rows) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    onto a multi-host sharding would instead require (and assert) the same
    array on every process. A scalar ``num_valid`` tail-batch marker is
    rewritten to a per-row ``valid_rows`` bool vector first, because each
    host's pads sit at the end of its own slice, not the end of the global
    batch (consumed via train.steps._valid_row_mask).
    """
    n = mesh.shape[axis]
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    procs = jax.process_count()

    if procs > 1 and isinstance(batch, dict) and "num_valid" in batch:
        batch = dict(batch)
        nv = int(batch.pop("num_valid"))
        rows = next(
            x.shape[0]
            for x in jax.tree.leaves(batch)
            if getattr(x, "ndim", 0) >= 1
        )
        batch["valid_rows"] = np.arange(rows) < nv

    def put(x):
        if procs > 1:
            if getattr(x, "ndim", 0) >= 1 and (x.shape[0] * procs) % n == 0:
                return jax.make_array_from_process_local_data(
                    data, np.asarray(x)
                )
            # replicated leaves must be identical on every host (jax
            # asserts it); true for the scalars the pipelines emit
            return jax.device_put(np.asarray(x), repl)
        shardable = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
        return jax.device_put(x, data if shardable else repl)

    return jax.tree.map(put, batch)


class ShardedPipeline:
    """Wrap a host pipeline so every batch lands sharded over the mesh.

    The CLI-facing form of the reference's DDP data path
    (main_finetune_cls_ddp.py:187-196 + DistributedSampler): one process
    drives the whole mesh; jitting the unchanged global-view step over the
    sharded batch makes XLA insert the gradient psums over ICI.
    """

    def __init__(self, inner, mesh: Mesh, axis: str = "data"):
        self.inner = inner
        self.mesh = mesh
        self.axis = axis

    def __len__(self) -> int:
        return len(self.inner)

    def __iter__(self):
        for batch in self.inner:
            yield shard_batch(self.mesh, batch, self.axis)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


class HostShardedSource:
    """Per-host shard of a dataset source for multi-host training.

    The TPU-native replacement for DistributedSampler (reference
    main_pretrain.py:218): each host feeds only its slice of the global
    batch; under a data mesh jit assembles the global batch from per-host
    shards. Wrap any indexable source:

        source = HostShardedSource(source, jax.process_index(),
                                   jax.process_count())
    """

    def __init__(self, source, process_index: int = None,
                 process_count: int = None):
        self.source = source
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )

    def __len__(self) -> int:
        return len(self.source) // self.process_count

    def load(self, index: int):
        return self.source.load(
            index * self.process_count + self.process_index
        )

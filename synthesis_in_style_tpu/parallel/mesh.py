"""Device-mesh utilities — the TPU-native replacement for the reference's
entire distributed substrate (DDP + NCCL/Gloo process groups + DistributedSampler
+ manual reduce_sum/all_gather, SURVEY.md §2.6).

Data parallelism here is: params replicated over a 1-D ("data",) mesh, batches
sharded on axis 0, and one `jax.jit` over the whole train step — XLA inserts
the gradient psum the reference got from DDP backward hooks, and every
`jnp.mean` over the batch is automatically the global collective the reference
coded by hand (e.g. the path-length mean, stylegan_2_updater.py:193-195).

Multi-host: `jax.distributed.initialize()` + per-host data loading with
`jax.make_array_from_process_local_data` replaces DistributedSampler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up — the TPU-native replacement for the reference's
    `setup_distributed` / `dist.init_process_group(nccl|gloo)`
    (train.py:59-62, train_stylegan_2.py:208-212).

    Must run BEFORE the first JAX backend touch, so it decides from the
    environment alone: initializes when a multi-host launch is indicated
    (JAX's own coordinator env, a Cloud-TPU pod runtime, or the explicit
    SIS_MULTIHOST opt-in). Single-process runs — including the CPU test
    mesh and the single-chip relay — skip it, because
    `jax.distributed.initialize()` outside a managed environment requires
    coordinator arguments and would fail.
    """
    import os

    def env_flag(name: str) -> bool:
        return os.environ.get(name, "").strip().lower() not in (
            "", "0", "false", "no", "off",
        )

    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    indicated = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or env_flag("SIS_MULTIHOST")
        # a Cloud-TPU pod slice lists >1 worker; single-host runtimes
        # (including the dev relay) set one hostname or none
        or ("," in hostnames)
    )
    if not indicated:
        return
    # Outside managed launchers (Slurm/OMPI/Cloud-TPU), JAX cannot
    # auto-detect process count/id — honor the conventional env vars so a
    # plain N-process launch (e.g. the multi-process CPU tests, or a bare
    # `for i in ...; python train.py &` across hosts) initializes too.
    kwargs = {}
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if (num is None) != (pid is None):
        # Exactly one of the pair set is always a launcher misconfiguration;
        # falling through to auto-detection here fails later with an
        # unrelated-looking coordinator error.
        raise RuntimeError(
            "JAX_NUM_PROCESSES and JAX_PROCESS_ID must be set together "
            f"(got JAX_NUM_PROCESSES={num!r}, JAX_PROCESS_ID={pid!r})"
        )
    if num is not None and pid is not None:
        kwargs = dict(num_processes=int(num), process_id=int(pid))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        # The only RuntimeError we tolerate is the idempotent re-init
        # across CLI layers. A genuinely failed bring-up (unreachable or
        # misconfigured coordinator) must ABORT: swallowing it would leave
        # process_count()==1 on every host and silently train independent
        # models on disjoint data shards instead of one DP run.
        msg = str(exc).lower()
        if "only be called once" in msg or "already initialized" in msg:
            return
        raise RuntimeError(
            "multi-host was indicated by the environment but "
            "jax.distributed.initialize() failed — refusing to fall back "
            "to independent single-host training"
        ) from exc


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first `n_devices` devices. With multiple axis
    names, `shape` gives the per-axis sizes (e.g. (4, 2) for ("data","model"))."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard array(s) along dim 0 over the data axis.

    Multi-host: each process's loader yields a DIFFERENT local batch (the
    data layer shards the dataset by `jax.process_index()`, like the
    reference's DistributedSampler), so the local arrays are this host's
    SHARD of a global batch of process_count * local_batch rows —
    `make_array_from_process_local_data` assembles that global array. A
    plain device_put here would instead treat each host's distinct batch
    as the same global batch and silently train on 1/H of every row.
    Single-process (any number of local devices): device_put sharding.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.device_put(batch, sharding)


def data_parallel_mesh(batch_size: int) -> Optional[Mesh]:
    """The mesh a train CLI should use: a ("data",) mesh over all devices
    when there is more than one and the global batch divides evenly; None
    (single-device execution) otherwise, with a warning so silent 1-of-N
    usage can't happen unnoticed.

    `batch_size` is the PER-PROCESS batch (the config value feeding this
    host's loader — reference DistributedSampler semantics); the global
    batch the mesh must divide is process_count times that."""
    n = jax.device_count()
    if n <= 1:
        return None
    global_batch = batch_size * jax.process_count()
    if global_batch % n != 0:
        import warnings

        warnings.warn(
            f"global batch {global_batch} ({jax.process_count()} processes "
            f"x {batch_size}) is not divisible by the {n} available "
            f"devices — training will run on ONE device; pick a divisible "
            f"batch size to enable data parallelism",
            stacklevel=2,
        )
        return None
    return make_mesh()


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of the global batch (multi-host data loading;
    replaces DistributedSampler, utils/data_loading.py:53-57)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

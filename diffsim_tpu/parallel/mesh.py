"""Device mesh and sharding policy.

The reference's only parallelism is NCCL DDP in the vendored DiT scripts
(/root/reference/DiT/train.py:117); the metric itself is single-GPU. The TPU-native design is
SPMD: a ('data', 'model') mesh; image *pairs* shard over 'data' (the benchmarks are
embarrassingly parallel over pairs), and 'model' is reserved for tensor-sharding larger
backbones (all current backbones fit one chip in bf16, so model=1 by default). XLA inserts the
ICI collectives; the only explicit ones are the psum-style reductions in training.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, model_axis: int = 1) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def kernel_jit(fn, mesh: Mesh | None, **jit_kwargs):
    """jax.jit that declares ``mesh`` as the kernel-SPMD context while tracing ``fn``.

    The Pallas dispatchers (ops/pallas/spmd.py) read this context to shard_map each kernel
    over the mesh's data axis; without it, multi-device graphs silently fall back to XLA
    math for every kernel (a bare pallas custom call has no SPMD partitioning rule). Use
    this instead of jax.jit for any sharded graph that runs UNet/DiT compute or the fused
    readout. With mesh=None it is plain jax.jit."""
    import functools

    if mesh is None:
        return jax.jit(fn, **jit_kwargs)
    from diffsim_tpu.ops.pallas import spmd

    @functools.wraps(fn)
    def traced(*args, **kwargs):
        with spmd.kernel_mesh(mesh):
            return fn(*args, **kwargs)

    return jax.jit(traced, **jit_kwargs)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pair/batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def maybe_init_distributed(force: bool = False) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize()`` when launched under a multi-host
    coordinator (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS env, or ``force=True`` for
    TPU-pod auto-detection). Replaces the reference's ``dist.init_process_group("nccl")``
    (/root/reference/DiT/train.py:117) — after this, ``jax.devices()`` spans the pod and
    ``make_mesh()`` builds the global mesh. Returns True if distributed mode is active.

    MUST run before anything touches the XLA backend — even ``jax.process_count()``
    initializes it, after which ``initialize()`` raises. So the coordinator check here is
    env-only; only after (maybe) initializing do we ask jax anything."""
    import os

    if force or os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # tolerate ONLY the repeat-call case; a failed bring-up (unreachable
            # coordinator, timeout) must raise — silently degrading to single-process
            # would run N independent duplicate jobs racing on the same output dirs
            if "once" not in str(e) and "already" not in str(e).lower():
                raise
    return jax.process_count() > 1


def global_batch_from_local(mesh: Mesh, local_batch):
    """Per-process local batch -> one global jax.Array sharded over the mesh 'data' axis.

    The SPMD replacement for the reference's DistributedSampler + per-rank DataLoader
    (/root/reference/DiT/train.py:165-180): each host loads only its slice and this assembles
    the global array without gathering pixels onto any single host. Works identically (and is
    a plain device_put) in single-process runs, so the same trainer code serves both."""
    ds = data_sharding(mesh)
    local_batch = np.asarray(local_batch)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, ds)
    return jax.make_array_from_process_local_data(ds, local_batch)

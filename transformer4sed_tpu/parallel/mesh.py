"""SPMD scale-out: device mesh + sharding rules.

The reference's entire parallelism story is single-process
``nn.DataParallel`` with replicate/scatter/gather per forward and a
pile of workarounds (attribute-forwarding wrapper, per-GPU query
expansion, batch divisibility asserts — SURVEY.md §2.4/§5.8). The
TPU-native replacement is one jitted SPMD program over a
``jax.sharding.Mesh``:

  * batch axis sharded over 'data' (gradients all-reduced over ICI by
    XLA automatically);
  * params/optimizer/EMA trees replicated (the model zoo tops out at
    ~90 M params — far below per-chip HBM) — a 'model' axis is left in
    the mesh signature for tensor-parallel extension;
  * the mean-teacher EMA is a local tree-map: student and teacher carry
    identical shardings, so no collective is emitted for it.

This removes every DataParallel workaround class. Eval metric
gathering stays host-side (scores are tiny).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def require_devices(n_devices: int, devices: Sequence) -> Sequence:
    """Check the backend has >= ``n_devices`` and return the first n.

    Raises a clear error on shortfall — silent truncation would make
    every downstream divisibility failure cryptic (the round-1 driver
    dryrun failed with exactly that symptom).
    """
    if len(devices) < n_devices:
        platform = devices[0].platform if devices else "none"
        raise ValueError(
            f"requested {n_devices} devices, backend has {len(devices)} "
            f"(platform={platform}); force a virtual CPU backend with "
            f"jax.config.update('jax_platforms','cpu') + "
            f"jax.config.update('jax_num_cpu_devices', {n_devices}) "
            f"before any device touch, or use ensure_virtual_devices()"
        )
    return devices[:n_devices]


def ensure_virtual_devices(n_devices: int) -> None:
    """Guarantee >= ``n_devices`` jax devices, preferring real hardware.

    Images that pre-import jax (sitecustomize) may have already
    initialized a single-chip backend; when that backend is short of
    devices this tears it down and rebuilds as an n-device virtual CPU
    backend — the same trick as ``tests/conftest.py``, but robust to
    the backend being initialized first (round-1 failure mode:
    MULTICHIP_r01.json). Only safe while no arrays from the old backend
    are live.
    """
    if jax.device_count() >= n_devices:
        return
    from jax.extend import backend as jex_backend

    jex_backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    got = jax.device_count()
    if got < n_devices:
        raise RuntimeError(
            f"could not provision {n_devices} virtual CPU devices (got {got})"
        )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data mesh by default; pass axis_names=('data', 'model') for 2-D.

    Fails loudly on device shortfall (see :func:`require_devices`).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = require_devices(n_devices, devices)
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(
    train_step: Callable,
    mesh: Mesh,
    donate_state: bool = True,
) -> Callable:
    """jit a ``(state, batch, key) -> (state, metrics)`` step over the mesh.

    State/key replicated, batch sharded on its leading dim. XLA inserts
    the gradient all-reduce over ICI.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),  # pytree prefixes: state, batch, key
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def put_batch(batch: Any, mesh: Mesh) -> Any:
    """Host batch -> jax.Array tree sharded ``P('data')`` over the mesh.

    Single-process: plain sharded device_put of the full batch.
    Multi-host (``jax.process_count() > 1``): ``batch`` is this
    process's LOCAL chunk of the global batch (produced by a
    ``process_shard=True`` DataLoader) and the global array is
    assembled via ``jax.make_array_from_process_local_data`` — no
    process ever holds the whole global batch.
    """
    from transformer4sed_tpu.parallel.multihost import make_global_batch

    return make_global_batch(batch, mesh)


def device_prefetch(iterator, mesh: Optional[Mesh] = None, size: int = 2):
    """Overlap host batch production with device compute.

    Wraps a host batch iterator: batches are device_put (sharded over
    the mesh when given) ``size`` steps ahead of consumption, so H2D
    transfer rides under the previous step's compute.
    """
    import collections
    import itertools

    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return put_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass

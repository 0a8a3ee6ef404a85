"""Multi-host scaling: DCN-level patch sharding + sharded checkpointing.

The reference is a single-process app (SURVEY.md section 2.3) — this layer is
the TPU-native extension for pod-scale runs. The axis mapping keeps traffic
where it belongs:

  patch — independent ocean patches: ZERO cross-device communication, so it
      is the axis to lay across hosts (DCN). `make_multihost_mesh` reshapes
      the global device array so the patch axis strides across processes and
      the rows axis stays inside one host's chips (ICI), where the FFT
      all-to-all lives (sharding.py).
  rows  — the distributed-FFT transpose axis: ICI-only by construction.

Checkpoint/resume of sharded states uses orbax (each process writes only its
own shards; restore reshards to any mesh). On a single process this exercises
the identical code path — the CPU-mesh tests in tests/test_multihost.py are
the dry-run the driver can execute without a pod.

Entry points for a real pod:
  jax.distributed.initialize()            # before any jax use, every host
  mesh = make_multihost_mesh(rows=4)
  step = make_multichip_step(mesh, config)  # from .sharding
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import PATCH_AXIS, ROWS_AXIS, _state_specs
from ..models.ocean import OceanState


def make_multihost_mesh(rows: int | None = None,
                        devices=None) -> Mesh:
    """A (patch, rows) mesh whose rows axis never leaves a host.

    Device order: jax returns devices grouped by process; reshaping to
    (num_processes, per_host, ...) and folding `rows` out of the per-host dim
    guarantees each rows-group is ICI-connected. The patch axis then spans
    processes — pure data parallelism over DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    procs = max(1, jax.process_count())
    per_host = n // procs
    if rows is None:
        rows = per_host if per_host > 0 else 1
    if per_host % rows:
        raise ValueError(
            f"rows={rows} must divide the {per_host} devices of one host "
            f"(the FFT all-to-all must ride ICI, not DCN)")
    arr = np.asarray(devices).reshape(procs * (per_host // rows), rows)
    return Mesh(arr, (PATCH_AXIS, ROWS_AXIS))


def save_sharded(path, state: OceanState) -> None:
    """Checkpoint a (possibly multi-host-)sharded OceanState with orbax.

    Every process writes only the shards it owns; the directory is a complete
    global snapshot (SURVEY.md section 5.4 — the reference has no equivalent;
    its only cross-frame state is foam + time, which this pytree carries).
    """
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(str(path), state)
    ckpt.wait_until_finished()


def restore_sharded(path, mesh: Mesh, template: OceanState) -> OceanState:
    """Restore a checkpoint onto `mesh` (any layout: orbax reshards).

    `template` supplies shapes/dtypes (e.g. a freshly-initialized state or
    `jax.eval_shape` output); the result carries the canonical state specs.
    """
    import orbax.checkpoint as ocp
    specs = _state_specs()
    abstract = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        template, specs)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(str(path), abstract)


def gather_maps(maps):
    """All-gather sharded maps to a host-local numpy pytree (every process
    gets the full arrays — the multi-host analog of MapStreamer's fetch)."""
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)),
        maps)

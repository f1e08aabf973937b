"""Device mesh and sharding helpers.

Replaces the reference's process-per-GPU NCCL runtime (reference:
code/train.py:82, code/workflows/trainer/base_trainer.py:42-47) with a single
program over a ``jax.sharding.Mesh``: parameters are replicated (or
channel-sharded over 'model' for tensor parallelism), batches are sharded
over the ``data`` axis, and every collective the reference issued by hand
(gradient all-reduce inside apex DDP, ``dist.all_reduce`` of IoU areas,
SyncBN stat sync) is emitted automatically by XLA over ICI when the sharded
arrays are reduced under jit.  No ports, no process spawning.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None, batch_size=None) -> Mesh:
    """Build the (data, space, model) mesh.

    ``runtime.mesh.data == -1`` auto-sizes the data axis: all remaining
    devices, capped to the largest divisor of the global batch size (a global
    batch of 6 on 8 chips runs data=6 — XLA requires even batch sharding).
    ``batch_size`` overrides the cap source (e.g. pseudo_policy.batch_size
    for generation).

    ``runtime.mesh.space`` > 1 enables SPATIAL partitioning: image rows are
    sharded over the ``space`` axis (see ``shard_batch``) and GSPMD inserts
    the conv halo exchanges automatically — the TPU answer to "the image
    doesn't fit one chip" (no reference analog; the reference crops instead,
    code/sseg/datasets/gtav_dataset.py:22).

    ``runtime.mesh.model`` > 1 enables TENSOR parallelism: parameters (and
    the mirrored optimizer/EMA state) are channel-sharded over the ``model``
    axis (see ``shard_state``) and GSPMD propagates the sharding through the
    network, inserting the collectives.  No reference analog (the 43M-param
    CNN never needed it, SURVEY §2.2) — this exists for backbones that
    outgrow one chip's HBM (e.g. SegFormer variants at high resolution).
    """
    devices = devices if devices is not None else jax.devices()
    data = cfg.runtime.mesh.data if cfg is not None else -1
    space = cfg.runtime.mesh.space if cfg is not None else 1
    model = cfg.runtime.mesh.model if cfg is not None else 1
    if model < 1 or model > len(devices):
        raise ValueError(
            f"runtime.mesh.model={model} does not fit the {len(devices)} "
            "available devices (need 1 <= model <= device count)."
        )
    if space < 1 or space > len(devices):
        raise ValueError(
            f"runtime.mesh.space={space} does not fit the {len(devices)} "
            "available devices (need 1 <= space <= device count)."
        )
    if model * space > len(devices):
        raise ValueError(
            f"mesh space={space} x model={model} already exceeds the "
            f"{len(devices)} available devices (no room for a data axis)."
        )
    if data == -1:
        data = len(devices) // (model * space)
        if batch_size is None and cfg is not None:
            batch_size = cfg.train.batch_size
        if batch_size:
            while batch_size % data != 0:
                data -= 1
    if data * space * model > len(devices) or data < 1:
        raise ValueError(
            f"mesh data={data} x space={space} x model={model} exceeds the "
            f"{len(devices)} available devices."
        )
    devs = np.asarray(devices[: data * space * model]).reshape(data, space, model)
    mesh = Mesh(devs, ("data", "space", "model"))
    # publish for activation-sharding constraints inside model code (the
    # SegFormer SRA K/V replication pin — parallel/hints.py); no-op consumer
    # unless space > 1
    from hiast_tpu.parallel.hints import set_mesh_hint

    set_mesh_hint(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, H, ...] arrays over ('data', 'space'): batch over chips AND
    image rows over chips."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _batch_spec(mesh: Mesh, x) -> NamedSharding:
    """Per-leaf batch sharding: spatial leaves ([B,H,W,...]) additionally
    shard rows over 'space' when the mesh has a space axis."""
    if mesh.shape.get("space", 1) > 1 and np.ndim(x) >= 3:
        return spatial_sharding(mesh)
    return batch_sharding(mesh)


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch axis sharded (and, on a
    space>1 mesh, image rows sharded too).

    Multi-host: each process passes its PROCESS-LOCAL slice of the global
    batch (global_batch / process_count samples — the DistributedSampler
    analog, reference base_trainer.py:68,81) and the global array is
    assembled across hosts without any cross-DCN data movement.
    """
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                _batch_spec(mesh, x), np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, _batch_spec(mesh, x)), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the mesh.  Multi-host: every process holds the
    same values by construction (identical PRNG seeding / checkpoint), so the
    local copy IS the global replicated array."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def model_sharding(mesh: Mesh, x) -> NamedSharding:
    """Tensor-parallel placement for one state leaf: shard the trailing
    (feature/channel) axis over 'model' when it divides evenly, else
    replicate.

    The trailing axis is the output-feature axis of every parameter family
    in the framework — conv kernels are HWIO, dense kernels are [in, out],
    and the per-channel vectors (bias, BN scale/bias/running stats) follow
    their producer's output channels — so one shape rule shards params,
    EMA params, and the mirrored Adam moments IDENTICALLY by construction.
    GSPMD propagates the channel sharding through elementwise ops/BN and
    inserts the conv/matmul collectives.  Scalars (step, Adam count) and
    non-divisible leaves (the 19-class head) stay replicated.
    """
    m = mesh.shape.get("model", 1)
    nd = np.ndim(x)
    if m > 1 and nd >= 1:
        dim = np.shape(x)[-1]
        if dim % m == 0 and dim >= 2 * m:
            return NamedSharding(mesh, P(*([None] * (nd - 1) + ["model"])))
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, tree):
    """Place a train-state pytree on the mesh: replicated on a model=1 mesh
    (exactly ``replicate``), channel-sharded over 'model' otherwise.

    Multi-host: every process holds the full value (same seed / checkpoint),
    so shards are served from the local copy by index.
    """
    if mesh.shape.get("model", 1) == 1:
        return replicate(mesh, tree)

    def put(x):
        s = model_sharding(mesh, x)
        if jax.process_count() > 1:
            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, s, lambda idx, _x=xnp: _x[idx]
            )
        return jax.device_put(x, s)

    return jax.tree.map(put, tree)

"""REAL multi-process distributed runtime test (VERDICT r2 missing #4).

Launches 2 OS processes that form a jax.distributed cluster over a local
coordinator (the TPU multi-host topology: one process per host, each with
its own local devices), then runs the actual mesh/sharding code paths —
``make_mesh`` over the GLOBAL device list, ``replicate`` and ``shard_batch``
via ``make_array_from_process_local_data``, and one jit'd sharded train step
— and asserts the cross-process loss equals the single-process run on the
same global batch.  This de-mocks the unit tests of
``parallel/mesh.py:shard_batch/replicate`` (reference equivalent: the NCCL
spawn in code/train.py:82 was the reference's primary operating mode).

Each subprocess uses the CPU collectives backend; the parent stays out of
the cluster.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np

# each "host" exposes ONE local CPU device -> 2-process, 2-device cluster
# (strip any inherited device-count flag first: last-one-wins is not assured)
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=1"])
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.environ["HIAST_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")  # the env may re-force a TPU platform
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import jax.numpy as jnp
from hiast_tpu.parallel.mesh import make_mesh, replicate, shard_batch

mesh = make_mesh(batch_size=4)  # global (data=2, space=1, model=1) mesh
assert mesh.devices.size == 2

# deterministic global batch; this process contributes its LOCAL half
rng = np.random.default_rng(0)
global_x = rng.normal(size=(4, 8)).astype(np.float32)
global_y = rng.normal(size=(4, 1)).astype(np.float32)
pid = jax.process_index()
local = {"x": global_x[pid * 2:(pid + 1) * 2], "y": global_y[pid * 2:(pid + 1) * 2]}

w = {"w": np.full((8, 1), 0.1, np.float32)}
params = replicate(mesh, w)
batch = shard_batch(mesh, local)


@jax.jit
def train_step(params, batch):
    def loss_fn(p):
        pred = batch["x"] @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
    return new_params, loss


params, loss = train_step(params, batch)

# ---- the REAL HIAST consistency step, sharded across both processes ----
from hiast_tpu.config import default_config
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.registry import populate
from hiast_tpu.selftrain.steps import make_consistency_step
from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

populate()
cfg = default_config()
cfg.model.type = "SelfTrainingSegmentor"
cfg.cst_training.is_enabled = True
cfg.cst_training.cst_loss.weight = 0.5
cfg.train.total_iter = 10
segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
v = segmentor.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
tx = make_optimizer(cfg, v["params"])
state = TrainState(
    step=jnp.zeros((), jnp.int32),
    params=v["params"],
    batch_stats=v["batch_stats"],
    opt_state=tx.init(v["params"]),
    ema_params=jax.tree.map(jnp.copy, v["params"]),
)
state = replicate(mesh, state)
r2 = np.random.default_rng(1)
g_img = r2.integers(0, 255, size=(4, 32, 64, 3)).astype(np.uint8)
g_plbl = np.where(
    r2.random(size=(4, 32, 64)) < 0.4, 255, r2.integers(0, 19, size=(4, 32, 64))
).astype(np.int32)
local_hiast = {
    "t_img": g_img[pid * 2:(pid + 1) * 2],
    "t_plbl": g_plbl[pid * 2:(pid + 1) * 2],
}
hiast_batch = shard_batch(mesh, local_hiast)
step = jax.jit(make_consistency_step(segmentor, tx, strong_aug=None))
_, losses = step(state, hiast_batch, jax.random.PRNGKey(2))

# fetching replicated outputs is valid on every process
out = {
    "loss": float(np.asarray(loss)),
    "w0": float(np.asarray(params["w"])[0, 0]),
    "hiast_loss": float(np.asarray(losses["target_seg_loss"])),
    "process": pid,
}
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step_matches_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            {
                "COORD": f"localhost:{port}",
                "PROC_ID": str(pid),
                "HIAST_REPO": REPO,
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
            )
        )
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["process"]] = r
    assert set(results) == {0, 1}

    # single-process ground truth on the same global batch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    y = rng.normal(size=(4, 1)).astype(np.float32)
    w = np.full((8, 1), 0.1, np.float32)
    pred = x @ w
    loss = float(np.mean((pred - y) ** 2))
    grad = 2.0 * x.T @ (pred - y) / 4.0
    w_new = w - 0.1 * grad

    for pid in (0, 1):
        assert abs(results[pid]["loss"] - loss) < 1e-5, (results[pid]["loss"], loss)
        assert abs(results[pid]["w0"] - w_new[0, 0]) < 1e-5
    # both processes observed the SAME replicated result (the all-reduce ran)
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["w0"] == results[1]["w0"]

    # real consistency-step loss: equal across processes AND equal to the
    # single-process run on the same global batch (data-parallel correctness
    # of the actual train step, incl. global-batch BN statistics)
    assert results[0]["hiast_loss"] == results[1]["hiast_loss"]
    import jax
    import jax.numpy as jnp

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_consistency_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.cst_training.is_enabled = True
    cfg.cst_training.cst_loss.weight = 0.5
    cfg.train.total_iter = 10
    segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
    v = segmentor.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
    tx = make_optimizer(cfg, v["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        ema_params=jax.tree.map(jnp.copy, v["params"]),
    )
    r2 = np.random.default_rng(1)
    batch = {
        "t_img": r2.integers(0, 255, size=(4, 32, 64, 3)).astype(np.uint8),
        "t_plbl": np.where(
            r2.random(size=(4, 32, 64)) < 0.4, 255, r2.integers(0, 19, size=(4, 32, 64))
        ).astype(np.int32),
    }
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug=None))
    _, losses = step(state, batch, jax.random.PRNGKey(2))
    want = float(np.asarray(losses["target_seg_loss"]))
    assert abs(results[0]["hiast_loss"] - want) < 1e-4, (results[0]["hiast_loss"], want)

"""Optimizer dynamics parity vs torch.

The reference trains with torch Adam (betas 0.9/0.999, coupled weight decay
5e-4) with backbone lr x1 / heads lr x10 and a cosine schedule stepped after
every update (reference: code/utils/utils.py:135-154, schedulers.py:7-14).
This test steps both implementations on identical params/grads for several
iterations and requires the trajectories to match to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from hiast_tpu.config import default_config
from hiast_tpu.selftrain.train_state import lr_schedule, make_optimizer

RNG = np.random.default_rng(13)


def make_params():
    return {
        "backbone": {"conv1": {"kernel": RNG.normal(size=(3, 3, 4, 4)).astype(np.float32)},
                      "bn1": {"scale": np.ones(4, np.float32), "bias": np.zeros(4, np.float32)}},
        "aspp": {"conv2d_list_0": {"kernel": RNG.normal(size=(3, 3, 4, 4)).astype(np.float32)}},
    }


def fixed_grads(params):
    return jax.tree.map(lambda p: np.full_like(p, 0.01) + 0.1 * p, params)


def run_optax(params_np, n_steps, total_iter, lr, opt_name):
    cfg = default_config()
    cfg.train.lr = lr
    cfg.train.total_iter = total_iter
    cfg.train.optimizer = opt_name
    params = jax.tree.map(jnp.asarray, params_np)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    for _ in range(n_steps):
        grads = jax.tree.map(jnp.asarray, fixed_grads(params_np))
        grads = jax.tree.map(lambda g, p: 0.01 + 0.1 * p, grads, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return jax.tree.map(np.asarray, params)


def run_torch(params_np, n_steps, total_iter, lr, opt_name):
    backbone = torch.nn.Parameter(torch.from_numpy(params_np["backbone"]["conv1"]["kernel"].copy()))
    bn_scale = torch.nn.Parameter(torch.from_numpy(params_np["backbone"]["bn1"]["scale"].copy()))
    bn_bias = torch.nn.Parameter(torch.from_numpy(params_np["backbone"]["bn1"]["bias"].copy()))
    head = torch.nn.Parameter(torch.from_numpy(params_np["aspp"]["conv2d_list_0"]["kernel"].copy()))
    bn_scale.requires_grad = False  # frozen BN
    bn_bias.requires_grad = False
    groups = [
        {"params": [backbone], "lr": lr},
        {"params": [head], "lr": lr * 10},
    ]
    cls = {"Adam": torch.optim.Adam, "AdamW": torch.optim.AdamW}[opt_name]
    opt = cls(groups, betas=(0.9, 0.999), weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total_iter, eta_min=lr * 1e-3)
    for _ in range(n_steps):
        opt.zero_grad()
        backbone.grad = 0.01 + 0.1 * backbone.detach()
        head.grad = 0.01 + 0.1 * head.detach()
        opt.step()
        sched.step()
    return {
        "backbone": {"conv1": {"kernel": backbone.detach().numpy()},
                      "bn1": {"scale": bn_scale.detach().numpy(), "bias": bn_bias.detach().numpy()}},
        "aspp": {"conv2d_list_0": {"kernel": head.detach().numpy()}},
    }


class TestOptimizerParity:
    def _compare(self, opt_name):
        params = make_params()
        lr, total, steps = 3e-4, 50, 10
        got = run_optax(params, steps, total, lr, opt_name)
        want = run_torch(params, steps, total, lr, opt_name)
        for path in (("backbone", "conv1", "kernel"), ("aspp", "conv2d_list_0", "kernel")):
            g, w = got, want
            for k in path:
                g, w = g[k], w[k]
            np.testing.assert_allclose(g, w, atol=2e-6, err_msg=str(path))
        # frozen BN untouched in both
        np.testing.assert_array_equal(
            got["backbone"]["bn1"]["scale"], params["backbone"]["bn1"]["scale"]
        )

    def test_adam(self):
        self._compare("Adam")

    def test_adamw(self):
        self._compare("AdamW")

    def test_cosine_lr_values(self):
        cfg = default_config()
        cfg.train.lr = 3e-6
        cfg.train.total_iter = 8000
        fn = lr_schedule(cfg)
        # torch CosineAnnealingLR after t steps exposes lr(t) for step t
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=3e-6)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=8000, eta_min=3e-9)
        for t in range(20):
            assert abs(float(fn(t)) - opt.param_groups[0]["lr"]) < 1e-12, t
            sched.step()

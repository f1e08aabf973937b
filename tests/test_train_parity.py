"""Multi-step TRAINING-DYNAMICS parity vs a torch twin.

The strongest mIoU proxy available without datasets: N full HIAST
consistency steps — EMA-teacher forward (eval-mode BN on the student's
running stats), student forward (train-mode BN, frozen affine), pseudo-CE +
KLD(confident) + entropy(ignored) + SoftCE consistency(ignored), torch-Adam
update (backbone lr x1 / head lr x10, coupled weight decay 5e-4), cosine
schedule stepped per iteration, per-step parameter EMA with wholesale buffer
copy — must track the torch reference trajectory to float tolerance.

This is exactly the class of bug (optimizer semantics, BN momentum/unbiased
running update, loss normalization, EMA ordering) that silently costs mIoU
on real data.  Reference semantics mirrored here:
  code/workflows/trainer/base_trainer.py:127-141  (update_model)
  code/workflows/trainer/consistency_self_training_trainer.py:62-124
  code/utils/utils.py:60-65,115-123,135-154       (freeze_bn/EMA/Adam)
  code/sseg/models/segmentors/self_training_segmentor.py:30-53,128-163
  code/sseg/models/modules/losses.py:32-89
The bf16-vs-fp32 trajectory drift bound lives at the bottom (PERF.md records
the measured numbers).
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from test_model import LAYERS, TorchDeepLabV2

from hiast_tpu.config import default_config
from hiast_tpu.models.convert import torch_state_dict_to_flax
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.registry import populate
from hiast_tpu.selftrain.steps import make_consistency_step
from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

populate()

B, H, W = 2, 33, 49
N_STEPS = 8
LR = 1e-4
TOTAL_ITER = 50
EMA_GAMMA = 0.99
IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def parity_cfg():
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.is_freeze_bn = True
    cfg.model.predictor.seg_loss.target_pseudo_weight = 1.0
    cfg.model.predictor.kld_loss.weight = 0.1
    cfg.model.predictor.ent_loss.weight = 2.0
    cfg.cst_training.is_enabled = True
    cfg.cst_training.cst_loss.type = "SoftCE"
    cfg.cst_training.cst_loss.weight = 0.5
    cfg.cst_training.cst_loss.region = "ignored"
    cfg.cst_training.ema_model.gamma = EMA_GAMMA
    cfg.cst_training.ema_model.iter_update = 1
    cfg.train.optimizer = "Adam"
    cfg.train.lr = LR
    cfg.train.total_iter = TOTAL_ITER
    cfg.train.lr_scheduler.type = "Cosine"
    return cfg


def make_batches(seed=7, n=N_STEPS):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n):
        img = rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8)
        plbl = np.where(
            rng.random(size=(B, H, W)) < 0.4,
            255,
            rng.integers(0, 19, size=(B, H, W)),
        ).astype(np.uint8)
        batches.append({"t_img": img, "t_plbl": plbl})
    return batches


# ---------------------------------------------------------------------------
# torch reference harness
# ---------------------------------------------------------------------------
def torch_losses(cfg, logits, plbl, cst_target):
    """Exact reference loss assembly (self_training_segmentor.py:30-53)."""
    losses = {}
    losses["target_seg_loss"] = cfg.model.predictor.seg_loss.target_pseudo_weight * F.cross_entropy(
        logits, plbl, ignore_index=255
    )
    # build_region_weight (:128-137): [B, C, H, W] broadcast weights
    reg_val = torch.ones_like(plbl, dtype=logits.dtype)
    reg_val[plbl == 255] = 0
    reg_val = reg_val.unsqueeze(1)
    w_conf = torch.ones_like(logits) * reg_val
    w_ign = torch.ones_like(logits) * (1 - reg_val)
    lsm = F.log_softmax(logits, dim=1)
    c = logits.shape[1]
    # _kld (:153-163)
    losses["kld_confident_loss"] = cfg.model.predictor.kld_loss.weight * (
        (-1.0 / c * w_conf * lsm).sum() / w_conf[w_conf > 0].numel()
    )
    # _entropy (:140-150)
    losses["ent_ignored_loss"] = cfg.model.predictor.ent_loss.weight * (
        (-torch.softmax(logits, dim=1) * w_ign * lsm).sum() / w_ign[w_ign > 0].numel()
    )
    # SoftCE on the ignored region (losses.py:39-89)
    per_elem = (-lsm) * cst_target
    per_elem = per_elem * (plbl == 255).unsqueeze(1)
    losses["cst_loss"] = cfg.cst_training.cst_loss.weight * (
        per_elem.sum() / (per_elem != 0).sum()
    )
    return losses


class TorchHarness:
    def __init__(self, cfg, twin):
        self.cfg = cfg
        self.model = twin
        self.ema = copy.deepcopy(twin)
        # freeze_bn (utils.py:60-65): affine params only; BN stays train-mode
        for m in self.model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                for p in m.parameters():
                    p.requires_grad = False
        groups = [
            {"params": list(self.model.backbone.parameters()), "lr": LR},
            {
                "params": list(self.model.aspp_convs.parameters())
                + list(self.model.representation.parameters()),
                "lr": LR * 10,
            },
        ]
        self.opt = torch.optim.Adam(groups, betas=(0.9, 0.999), weight_decay=5e-4)
        self.sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            self.opt, T_max=TOTAL_ITER, eta_min=LR * 1e-3
        )

    @staticmethod
    def _norm(img_uint8):
        x = torch.from_numpy(np.moveaxis(img_uint8, -1, 1).astype(np.float32)) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def _forward(self, model, img):
        logits, _ = model(img)
        return F.interpolate(logits, size=img.shape[2:], mode="bilinear", align_corners=True)

    def step(self, batch):
        img = self._norm(batch["t_img"])
        plbl = torch.from_numpy(batch["t_plbl"].astype(np.int64))
        # teacher forward, eval mode (consistency trainer :113-119)
        self.ema.eval()
        with torch.no_grad():
            cst = torch.softmax(self._forward(self.ema, img), dim=1)
        self.model.train()
        logits = self._forward(self.model, img)
        losses = torch_losses(self.cfg, logits, plbl, cst)
        # update_model (base_trainer.py:127-141)
        total = sum(v for k, v in losses.items() if "D_" not in k)
        self.opt.zero_grad()
        total.backward()
        self.opt.step()
        # update_ema_model (utils.py:115-123): params EMA, buffers copied
        with torch.no_grad():
            for pk, pq in zip(self.ema.parameters(), self.model.parameters()):
                pk.data = pk.data * EMA_GAMMA + pq.data * (1 - EMA_GAMMA)
            for bk, bq in zip(self.ema.buffers(), self.model.buffers()):
                bk.data = bq.data.clone()
        self.sched.step()
        return {k: float(v.detach()) for k, v in losses.items()}


# ---------------------------------------------------------------------------
# jax harness
# ---------------------------------------------------------------------------
def run_jax(cfg, init_variables, batches, dtype=jnp.float32):
    segmentor = build_segmentor(cfg, dtype=dtype, backbone_layers=LAYERS)
    params = jax.tree.map(jnp.asarray, init_variables["params"])
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=jax.tree.map(jnp.asarray, init_variables["batch_stats"]),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug=None))
    loss_log = []
    for batch in batches:
        state, losses = step(state, batch, jax.random.PRNGKey(0))
        loss_log.append({k: float(v) for k, v in losses.items()})
    return state, loss_log


def randomized_twin(seed=11):
    torch.manual_seed(seed)
    twin = TorchDeepLabV2(layers=LAYERS)
    for m in twin.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)
    return twin


def assert_trees_close(got_tree, want_tree, max_atol, mean_atol, what):
    """Per-leaf max AND mean absolute difference bounds.

    Cross-framework fp32 noise amplifies chaotically through Adam's gradient
    normalization (measured: per-step loss agreement decays ~3x/step from
    3e-7 to ~1e-4 over 8 steps), so worst-element diffs admit a loose bound —
    but a SYSTEMATIC bug (wrong lr group, wd coupling, BN momentum, EMA
    ordering) shifts whole tensors, so the per-leaf MEAN bound is kept tight.
    """
    got_leaves = jax.tree_util.tree_leaves_with_path(got_tree)
    want = jax.tree_util.tree_leaves(want_tree)
    assert len(got_leaves) == len(want)
    for (path, g), w in zip(got_leaves, want):
        d = np.abs(np.asarray(g, np.float32) - np.asarray(w, np.float32))
        label = f"{what}{jax.tree_util.keystr(path)}"
        assert float(d.max()) < max_atol, f"{label}: max|diff|={float(d.max())}"
        assert float(d.mean()) < mean_atol, f"{label}: mean|diff|={float(d.mean())}"


class TestTrainingDynamicsParity:
    @pytest.fixture(scope="class")
    def trajectories(self):
        cfg = parity_cfg()
        twin = randomized_twin()
        init_variables = torch_state_dict_to_flax(twin.state_dict_reference_names())
        batches = make_batches()
        harness = TorchHarness(cfg, twin)
        torch_losses_log = [harness.step(b) for b in batches]
        jax_state, jax_losses_log = run_jax(cfg, init_variables, batches)
        return cfg, harness, jax_state, torch_losses_log, jax_losses_log

    def test_per_step_losses_track_torch(self, trajectories):
        _, _, _, want_log, got_log = trajectories
        for i, (want, got) in enumerate(zip(want_log, got_log)):
            assert set(want) == set(got), (i, want.keys(), got.keys())
            for k in want:
                rel = abs(got[k] - want[k]) / max(abs(want[k]), 1e-8)
                # step 0 is a pure forward+loss comparison: very tight.
                # later steps accumulate chaotic fp32 noise (~3x/step,
                # measured baseline 1.8e-4 worst at step 6)
                tol = 2e-5 if i == 0 else 1e-3
                assert rel < tol, f"step {i} {k}: jax={got[k]} torch={want[k]}"

    def test_final_params_and_buffers_match(self, trajectories):
        _, harness, jax_state, _, _ = trajectories
        want = torch_state_dict_to_flax(harness.model.state_dict_reference_names())
        # measured noise baseline: max 6.5e-4 / mean 2.2e-5 over 8 steps
        assert_trees_close(jax_state.params, want["params"], 5e-3, 1e-4, "params")
        # train-mode BN parity: running stats updated with torch's unbiased
        # variance + momentum 0.1 (VERDICT r2 weak #5 pin); measured noise
        # baseline max 3.4e-3 / mean 4e-4 (downstream activations amplify
        # the param noise)
        assert_trees_close(
            jax_state.batch_stats, want["batch_stats"], 2e-2, 2e-3, "batch_stats"
        )

    def test_ema_params_match(self, trajectories):
        _, harness, jax_state, _, _ = trajectories
        want = torch_state_dict_to_flax(harness.ema.state_dict_reference_names())
        # measured noise baseline: max 3.1e-5 / mean 7.5e-7
        assert_trees_close(jax_state.ema_params, want["params"], 3e-4, 1e-5, "ema_params")

    def test_frozen_bn_affine_and_representation_pinned(self, trajectories):
        """freeze_bn semantics: BN scale/bias must not move; the vestigial
        representation head gets no torch grads so it must not move either."""
        _, harness, jax_state, _, _ = trajectories
        twin0 = randomized_twin()  # same seed -> identical init
        init_vars = torch_state_dict_to_flax(twin0.state_dict_reference_names())

        def bn_affine(tree):
            out = {}
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                keys = [getattr(p, "key", str(p)) for p in path]
                if any(k.startswith("bn") or k.endswith("_bn") for k in keys):
                    out[jax.tree_util.keystr(path)] = np.asarray(leaf)
            return out

        got, init = bn_affine(jax_state.params), bn_affine(init_vars["params"])
        assert got.keys() == init.keys() and len(got) > 0
        for k in got:
            np.testing.assert_array_equal(got[k], init[k], err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(jax_state.params["representation"]["kernel"]),
            np.asarray(init_vars["params"]["representation"]["kernel"]),
        )

    def test_params_actually_moved(self, trajectories):
        """Guard against vacuous parity (nothing trained on either side)."""
        _, harness, jax_state, _, _ = trajectories
        twin0 = randomized_twin()
        init_vars = torch_state_dict_to_flax(twin0.state_dict_reference_names())
        moved = np.abs(
            np.asarray(jax_state.params["aspp"]["conv2d_list_0"]["kernel"])
            - init_vars["params"]["aspp"]["conv2d_list_0"]["kernel"]
        ).max()
        assert moved > 1e-4, moved


def test_bf16_trajectory_drift_bounded():
    """bf16 production dtype vs the fp32 parity trajectory: the loss
    trajectory must stay within a few percent over N steps (the drift the
    apex-O1 -> bf16 transition introduces; bounded, recorded in PERF.md)."""
    cfg = parity_cfg()
    twin = randomized_twin()
    init_variables = torch_state_dict_to_flax(twin.state_dict_reference_names())
    batches = make_batches()
    _, log32 = run_jax(cfg, init_variables, batches)
    _, log16 = run_jax(cfg, init_variables, batches, dtype=jnp.bfloat16)
    worst = 0.0
    for want, got in zip(log32, log16):
        t32 = sum(want.values())
        t16 = sum(got.values())
        worst = max(worst, abs(t16 - t32) / max(abs(t32), 1e-8))
    assert worst < 0.05, f"bf16 total-loss drift {worst:.4f} exceeds 5%"


# ---------------------------------------------------------------------------
# adversarial warmup trajectory parity (G + D optimizers)
# ---------------------------------------------------------------------------
D_LR = 5e-4


class TorchFCDiscriminator(tnn.Module):
    """Reference discriminator (code/sseg/models/modules/discriminator.py)."""

    def __init__(self, num_classes=19, ndf=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(num_classes, ndf, 4, stride=2, padding=1)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, stride=2, padding=1)
        self.conv3 = tnn.Conv2d(ndf * 2, ndf * 4, 4, stride=2, padding=1)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, stride=2, padding=1)
        self.classifier = tnn.Conv2d(ndf * 8, 1, 4, stride=2, padding=1)

    def forward(self, x):
        act = tnn.functional.leaky_relu
        x = act(self.conv1(x), 0.2)
        x = act(self.conv2(x), 0.2)
        x = act(self.conv3(x), 0.2)
        x = act(self.conv4(x), 0.2)
        return self.classifier(x)

    def flax_params(self):
        out = {}
        for name in ("conv1", "conv2", "conv3", "conv4", "classifier"):
            m = getattr(self, name)
            out[name] = {
                "kernel": np.array(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": np.array(m.bias.detach().numpy()),
            }
        return {"params": out}


def adv_cfg():
    cfg = parity_cfg()
    cfg.model.type = "AdversarialWarmupSegmentor"
    cfg.model.discriminator.is_enabled = True
    cfg.model.discriminator.lr = D_LR
    cfg.model.discriminator.is_entropy_input = False  # AdaptSegNet
    cfg.model.discriminator.D_loss.type = "BCEWithLogits"
    cfg.model.discriminator.D_loss.weight = 1.0
    cfg.model.discriminator.D_loss.adv_weight = 0.01
    cfg.model.predictor.seg_loss.source_weight = 1.0
    cfg.model.predictor.ent_loss.weight = 1.0  # MinEnt on target
    return cfg


class TorchAdvHarness:
    """Reference G/D update semantics (base_trainer.py:127-141 +
    adversarial_warmup_segmentor.py:33-69)."""

    def __init__(self, cfg, twin, disc):
        self.cfg = cfg
        self.model = twin
        self.disc = disc
        for m in self.model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                for p in m.parameters():
                    p.requires_grad = False
        groups = [
            {"params": list(self.model.backbone.parameters()), "lr": LR},
            {
                "params": list(self.model.aspp_convs.parameters())
                + list(self.model.representation.parameters()),
                "lr": LR * 10,
            },
        ]
        self.g_opt = torch.optim.Adam(groups, betas=(0.9, 0.999), weight_decay=5e-4)
        self.d_opt = torch.optim.Adam(disc.parameters(), lr=D_LR, betas=(0.9, 0.999))
        # reference build_scheduler: eta_min = cfg.train.lr * 1e-3 for BOTH
        self.g_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            self.g_opt, T_max=TOTAL_ITER, eta_min=LR * 1e-3
        )
        self.d_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            self.d_opt, T_max=TOTAL_ITER, eta_min=LR * 1e-3
        )

    def _forward(self, img):
        logits, _ = self.model(img)
        return F.interpolate(logits, size=img.shape[2:], mode="bilinear", align_corners=True)

    def step(self, batch):
        cfg = self.cfg
        s_img = TorchHarness._norm(batch["s_img"])
        t_img = TorchHarness._norm(batch["t_img"])
        s_lbl = torch.from_numpy(batch["s_lbl"].astype(np.int64))
        self.model.train()
        s_logits = self._forward(s_img)
        t_logits = self._forward(t_img)
        bce = tnn.BCEWithLogitsLoss()
        losses = {}
        losses["source_seg_loss"] = cfg.model.predictor.seg_loss.source_weight * F.cross_entropy(
            s_logits, s_lbl, ignore_index=255
        )
        t_d = self.disc(torch.softmax(t_logits, dim=1))
        losses["adv_loss"] = cfg.model.discriminator.D_loss.adv_weight * bce(
            t_d, torch.zeros_like(t_d)
        )
        s_d_det = self.disc(torch.softmax(s_logits.detach(), dim=1))
        t_d_det = self.disc(torch.softmax(t_logits.detach(), dim=1))
        losses["D_loss"] = cfg.model.discriminator.D_loss.weight * (
            bce(s_d_det, torch.zeros_like(s_d_det)) + bce(t_d_det, torch.ones_like(t_d_det))
        ) / 2
        # MinEnt (entropy_loss, adversarial_warmup_segmentor.py:78-86)
        v = torch.softmax(t_logits, dim=1)
        n, c, h, w = v.shape
        losses["target_ent_loss"] = cfg.model.predictor.ent_loss.weight * (
            -torch.sum(v * torch.log2(v + 1e-30)) / (n * h * w * np.log2(c))
        )
        # update_model: G step (sum of non-D losses), then D step
        g_loss = sum(v for k, v in losses.items() if "D_" not in k)
        self.g_opt.zero_grad()
        g_loss.backward(retain_graph=True)
        self.g_opt.step()
        self.d_opt.zero_grad()
        losses["D_loss"].backward()
        self.d_opt.step()
        self.g_sched.step()
        self.d_sched.step()
        return {k: float(v.detach()) for k, v in losses.items()}


class TestAdversarialDynamicsParity:
    @pytest.fixture(scope="class")
    def adv_trajectories(self):
        import jax

        from hiast_tpu.selftrain.steps import make_adversarial_step
        from hiast_tpu.selftrain.train_state import make_d_optimizer

        cfg = adv_cfg()
        twin = randomized_twin()
        torch.manual_seed(5)
        disc = TorchFCDiscriminator()
        init_vars = torch_state_dict_to_flax(twin.state_dict_reference_names())
        d_init = disc.flax_params()

        rng = np.random.default_rng(17)
        batches = []
        for _ in range(5):
            batches.append({
                "s_img": rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8),
                "t_img": rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8),
                "s_lbl": np.where(
                    rng.random(size=(B, H, W)) < 0.2,
                    255,
                    rng.integers(0, 19, size=(B, H, W)),
                ).astype(np.uint8),
            })

        harness = TorchAdvHarness(cfg, twin, disc)
        torch_log = [harness.step(b) for b in batches]

        segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=LAYERS)
        params = jax.tree.map(jnp.asarray, init_vars["params"])
        tx = make_optimizer(cfg, params)
        d_tx = make_d_optimizer(cfg)
        d_params = jax.tree.map(jnp.asarray, d_init)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.asarray, init_vars["batch_stats"]),
            opt_state=tx.init(params),
            d_params=d_params,
            d_opt_state=d_tx.init(d_params),
        )
        step = jax.jit(make_adversarial_step(segmentor, tx, d_tx))
        jax_log = []
        for b in batches:
            state, losses = step(state, b, jax.random.PRNGKey(0))
            jax_log.append({k: float(v) for k, v in losses.items()})
        return harness, state, torch_log, jax_log

    def test_g_and_d_losses_track_torch(self, adv_trajectories):
        _, _, want_log, got_log = adv_trajectories
        for i, (want, got) in enumerate(zip(want_log, got_log)):
            assert set(want) == set(got), (i, want.keys(), got.keys())
            for k in want:
                rel = abs(got[k] - want[k]) / max(abs(want[k]), 1e-8)
                tol = 5e-5 if i == 0 else 2e-3
                assert rel < tol, f"step {i} {k}: jax={got[k]} torch={want[k]}"

    def test_final_g_and_d_params_match(self, adv_trajectories):
        harness, state, _, _ = adv_trajectories
        want = torch_state_dict_to_flax(harness.model.state_dict_reference_names())
        assert_trees_close(state.params, want["params"], 5e-3, 1e-4, "g_params")
        d_want = harness.disc.flax_params()
        assert_trees_close(state.d_params, d_want, 5e-3, 1e-4, "d_params")
        assert_trees_close(
            state.batch_stats, want["batch_stats"], 2e-2, 2e-3, "batch_stats"
        )

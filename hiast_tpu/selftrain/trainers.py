"""Training workflows (TRAINER registry).

Orchestration layer over the jit'd steps: data streams in, one device program
per iteration, periodic validation + checkpointing.  Mirrors the reference's
four trainers (reference: code/workflows/trainer/*.py) minus everything the
TPU runtime absorbs — no process spawning, no DistributedSampler, no apex,
no manual EMA loop, no explicit all_reduces.
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hiast_tpu.data.datasets import build_dataset
from hiast_tpu.data.pipeline import BatchIterator, infinite_batches
from hiast_tpu.evaluation import make_val_step, run_validation
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from hiast_tpu.registry import TRAINER
from hiast_tpu.selftrain import steps as S
from hiast_tpu.selftrain.train_state import (
    TrainState,
    lr_schedule,
    make_d_optimizer,
    make_optimizer,
)
from hiast_tpu.utils.checkpoint import CheckpointPolicy, load_weights
from hiast_tpu.utils.logging_utils import Profiler, init_logger, init_writer
from hiast_tpu.utils.recorder import ResultRecorder


class BaseTrainer:
    """Common assembly: model, optimizer, state, data, recorder, ckpt policy.

    ``datasets`` may inject pre-built dataset objects (keys 'source',
    'target', 'val') — used by tests and benchmarks with synthetic data.
    ``backbone_layers`` shrinks the trunk for tests.
    """

    needs_source = False
    needs_target = False

    def __init__(self, cfg, datasets: dict | None = None, backbone_layers=None):
        self.cfg = cfg
        self.datasets = datasets or {}
        self.backbone_layers = backbone_layers
        self.assert_cfg()
        self.initialize()
        self.build_all_model()
        self.build_train_data_reader()
        self.build_val_data_reader()

    # -- hooks ---------------------------------------------------------------
    def assert_cfg(self):
        pass

    def make_step(self) -> Callable:
        raise NotImplementedError

    def next_batch(self) -> dict:
        raise NotImplementedError

    # -- assembly ------------------------------------------------------------
    def initialize(self):
        np.random.seed(self.cfg.train.random_seed)
        self.base_rng = jax.random.PRNGKey(self.cfg.train.random_seed)
        work_dir = self.cfg.work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.logger = init_logger(os.path.join(work_dir, "train.log"))
        self.writer = init_writer(os.path.join(work_dir, "tensorboard"))
        self.mesh = make_mesh(self.cfg)
        self.profiler = Profiler(self.cfg, work_dir)
        self.ckpt = CheckpointPolicy(
            os.path.join(work_dir, "checkpoints"),
            self.cfg.train.total_iter,
            self.cfg.train.is_save_all,
            keep=self.cfg.runtime.checkpoint.keep,
        )

    def _compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self.cfg.runtime.precision.compute_dtype
        ]

    def build_all_model(self):
        cfg = self.cfg
        self.segmentor = build_segmentor(
            cfg, dtype=self._compute_dtype(), backbone_layers=self.backbone_layers
        )
        # small default init shape: no parameter depends on input spatial
        # size, and a full-crop un-jitted init costs minutes on the
        # tunneled TPU (see Segmentor.init_variables)
        variables = self.segmentor.init_variables(
            jax.random.PRNGKey(cfg.train.random_seed)
        )
        variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        # ImageNet (or other) backbone init, applied BEFORE any resume so a
        # resume checkpoint wins — the reference builds its backbone from
        # torchvision ImageNet weights (code/sseg/models/modules/resnet.py:193-214)
        pretrained = cfg.model.seg_model.pretrained
        if pretrained:
            variables = load_weights(pretrained, variables)
            self.logger.info(f"initialized from pretrained weights {pretrained}")
        # weights-only init (the reference's cross-round resume semantics):
        # params + batch_stats from a .pth OR Orbax dir; step/opt_state/EMA
        # start fresh so the round trains its full schedule
        if cfg.train.init_from:
            variables = load_weights(cfg.train.init_from, variables)
            self.logger.info(f"initialized weights from {cfg.train.init_from}")
        resume = cfg.train.resume_from
        if resume and not os.path.isdir(resume):  # weights-only (.pth)
            variables = load_weights(resume, variables)
            self.logger.info(f"resumed weights from {resume}")
        self.tx = make_optimizer(cfg, variables["params"])
        state_kwargs = dict(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=jax.jit(self.tx.init)(variables["params"]),
        )
        self.d_tx = None
        state_kwargs.update(self.extra_state(variables))
        if resume and os.path.isdir(resume):
            state_kwargs = self._restore_from_orbax(resume, state_kwargs)
        # replicated on a model=1 mesh; channel-sharded over 'model' (tensor
        # parallelism) otherwise — params, EMA, Adam moments all by the same
        # shape rule (mesh.model_sharding)
        self.state = shard_state(self.mesh, TrainState(**state_kwargs))
        self.lr_fn = lr_schedule(cfg)
        self.model_recorder = ResultRecorder(
            cfg, "model", self.logger, self.writer, self.lr_fn
        )
        step = self.make_step()
        if self.mesh.shape.get("model", 1) > 1:
            # pin the OUTPUT state to the input placement: without the
            # constraint GSPMD may pick a different layout for the returned
            # state, resharding it on every step boundary
            out_shardings = jax.tree.map(lambda x: x.sharding, self.state)

            def step(state, batch, rng, _inner=step, _out=out_shardings):
                new_state, losses = _inner(state, batch, rng)
                return jax.lax.with_sharding_constraint(new_state, _out), losses

        self.step_fn = jax.jit(step, donate_argnums=0)

    def extra_state(self, variables) -> dict:
        return {}

    def _restore_from_orbax(self, resume: str, state_kwargs: dict) -> dict:
        """Resume from an Orbax checkpoint: FULL state (step/opt/EMA) when the
        checkpoint carries it — a strict superset of the reference's
        weights-only resume (SURVEY §5.4) — else weights-only."""
        from hiast_tpu.utils.checkpoint import load_train_state

        ckpt_dir, name = os.path.split(os.path.normpath(resume))
        template = {k: v for k, v in state_kwargs.items() if v is not None}
        try:
            restored = load_train_state(ckpt_dir, name, template)
            state_kwargs.update(restored)
            self.logger.info(f"resumed FULL train state from {resume}")
        except Exception as e:  # noqa: BLE001 - weights-only checkpoint
            # Name the reason: a weights-only checkpoint is routine, but a
            # corrupt/mismatched full-state checkpoint falling back silently
            # (fresh optimizer, step 0) is exactly what an operator must see.
            self.logger.warning(
                f"full-state restore from {resume} unavailable "
                f"({type(e).__name__}: {e}); falling back to weights-only"
            )
            variables = load_weights(
                resume,
                {"params": state_kwargs["params"], "batch_stats": state_kwargs["batch_stats"]},
            )
            state_kwargs["params"] = variables["params"]
            state_kwargs["batch_stats"] = variables["batch_stats"]
            if state_kwargs.get("ema_params") is not None:
                state_kwargs["ema_params"] = jax.tree.map(jnp.asarray, variables["params"])
            self.logger.info(f"resumed weights from {resume}")
        return state_kwargs

    def _workers(self):
        n = self.cfg.dataset.num_workers
        return n if n and n > 0 else None  # None -> auto (cpu_count - 1)

    def _local_batch(self) -> int:
        """Per-process share of the GLOBAL batch (DistributedSampler analog,
        reference train.py:52-54 + base_trainer.py:68); on a single host this
        is the global batch itself."""
        n = jax.process_count()
        b = self.cfg.train.batch_size
        assert b % n == 0, f"global batch {b} not divisible by {n} processes"
        return b // n

    def _stream_seed(self, offset: int) -> int:
        """Distinct per-process sample streams (set_epoch-style reseed)."""
        return self.cfg.train.random_seed + offset + 7919 * jax.process_index()

    def build_train_data_reader(self):
        cfg = self.cfg
        if self.needs_source:
            ds = self.datasets.get("source") or build_dataset(cfg, "source")
            self.s_stream = infinite_batches(
                ds, self._local_batch(), seed=self._stream_seed(0),
                num_workers=self._workers(),
            )
        if self.needs_target:
            ds = self.datasets.get("target") or build_dataset(
                cfg, "target", pseudo_dir=cfg.dataset.target.pseudo_dir
            )
            self.t_dataset = ds
            self.t_stream = infinite_batches(
                ds, self._local_batch(), seed=self._stream_seed(1),
                num_workers=self._workers(),
            )

    def build_val_data_reader(self):
        cfg = self.cfg
        self.v_dataset = self.datasets.get("val")
        if self.v_dataset is None and cfg.dataset.val.type:
            self.v_dataset = build_dataset(cfg, "val", aug_type=[])
        self.val_step = None
        if self.v_dataset is not None and cfg.dataset.val.resize_size:
            self.val_step = make_val_step(
                self.segmentor, cfg.dataset.val.resize_size, cfg.dataset.num_classes
            )

    # -- loop ----------------------------------------------------------------
    def _install_preemption_handler(self):
        """TPU VMs are preempted with SIGTERM; convert it into a graceful
        end-of-iteration full-state checkpoint + clean stop (resumable via
        train.resume_from=<work_dir>/checkpoints/model_last).  The reference
        loses the run on any mid-run failure (SURVEY §5.3)."""
        import signal

        self._stop_requested = False

        def handler(signum, frame):
            self._stop_requested = True
            self.logger.warning(
                f"received signal {signum}: will checkpoint and stop after this iteration"
            )

        try:
            self._prev_sigterm = signal.signal(signal.SIGTERM, handler)
        except ValueError:  # not the main thread (e.g. embedded use)
            self._prev_sigterm = None

    def _restore_preemption_handler(self):
        import signal

        if getattr(self, "_prev_sigterm", None) is not None:
            signal.signal(signal.SIGTERM, self._prev_sigterm)

    def _record_step_flops(self, batch, rng) -> None:
        """Populate the recorder's MFU inputs from XLA cost analysis
        (runtime.report_mfu).  The AOT lower+compile hits the persistent
        compilation cache, so this costs seconds, not a recompile."""
        if not getattr(self.cfg.runtime, "report_mfu", True):
            return
        from hiast_tpu.runtime_init import chip_peak_flops

        peak = chip_peak_flops()
        if peak is None:  # CPU tests / unknown chips
            return
        try:
            ca = self.step_fn.lower(self.state, batch, rng).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001 - diagnostics only
            self.logger.info(f"MFU reporting disabled (cost analysis failed: {e})")
            return
        if np.isfinite(flops) and flops > 0:
            self.model_recorder.step_flops = flops
            self.model_recorder.peak_flops = peak * self.mesh.devices.size

    def run(self):
        cfg = self.cfg
        self.logger.info("=" * 100)
        self.logger.info(f"config:\n{cfg.dump()}")
        self.logger.info("=" * 100)
        self.model_recorder.reset_time_and_losses()
        self._install_preemption_handler()

        try:
            start = int(np.asarray(self.state.step)) + 1  # mid-run resume support
            # one-batch-deep software pipeline (same pattern as pseudo-gen,
            # pseudo/generator.py): dispatch step k, THEN assemble + H2D
            # batch k+1 while the device executes, THEN fetch k's losses.
            # On PCIe hosts this hides the host data work; on the tunneled
            # dev chip it also hides the 0.3-0.5 s/iter batch upload.
            batch = shard_batch(self.mesh, self.next_batch())
            for it in range(start, cfg.train.total_iter + 1):
                self.profiler.step(it)
                rng = jax.random.fold_in(self.base_rng, it)
                if it == start:
                    self._record_step_flops(batch, rng)
                self.state, losses = self.step_fn(self.state, batch, rng)
                if it < cfg.train.total_iter:
                    batch = shard_batch(self.mesh, self.next_batch())
                self.model_recorder.record_losses(losses)
                if it % cfg.train.iter_report == 0:
                    self.model_recorder.report_losses(it)
                if self.val_step is not None and it % cfg.train.iter_val == 0:
                    self.validate(it)
                if self._stop_requested:
                    self.save_checkpoint(it, is_best=False)
                    self.logger.warning(
                        f"preemption checkpoint saved at iter {it}; resume with "
                        f"train.resume_from={self.ckpt.ckpt_dir}/model_last"
                    )
                    break
            else:
                # Final checkpoint regardless of validation cadence: with no
                # val dataset, or total_iter not a multiple of iter_val, the
                # in-loop saves (all inside validate()) would otherwise drop
                # the last iterations' weights on the floor — and run_rounds
                # would feed a stale model_last into the next round.
                if self._last_ckpt_iter < cfg.train.total_iter:
                    self.save_checkpoint(cfg.train.total_iter, is_best=False)
        finally:
            self._restore_preemption_handler()
        self.model_recorder.report_end_info()

    def validate(self, iteration: int):
        cfg = self.cfg
        val_iter = BatchIterator(
            self.v_dataset, cfg.validate.batch_size, shuffle=False, drop_last=False
        )
        iou, miou = run_validation(
            self.val_step, self.state.params, self.state.batch_stats, val_iter,
            mesh=self.mesh,
        )
        is_best = self.model_recorder.record_and_report_metrics(miou, iou, iteration)
        self.save_checkpoint(iteration, is_best)

    def checkpoint_tree(self) -> dict:
        tree = {
            "step": self.state.step,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
        }
        if self.state.ema_params is not None:
            tree["ema_params"] = self.state.ema_params
        if self.state.d_params is not None:
            tree["d_params"] = self.state.d_params
        if self.state.d_opt_state is not None:
            # without it, an adversarial full-state resume would silently
            # reset D's Adam moments/schedule while G resumes mid-decay
            tree["d_opt_state"] = self.state.d_opt_state
        return tree

    _last_ckpt_iter = 0

    def save_checkpoint(self, iteration: int, is_best: bool):
        self.ckpt.save("model", self.checkpoint_tree(), iteration, is_best)
        self._last_ckpt_iter = iteration


@TRAINER.register("SourceOnlyTrainer")
class SourceOnlyTrainer(BaseTrainer):
    needs_source = True

    def make_step(self):
        return S.make_source_only_step(self.segmentor, self.tx)

    def next_batch(self):
        b = next(self.s_stream)
        return {"s_img": b["images"], "s_lbl": b["labels"]}  # uint8; cast on device


@TRAINER.register("SelfTrainingTrainer")
class SelfTrainingTrainer(BaseTrainer):
    """Target-only training on pseudo labels (reference self_training_trainer.py)."""

    needs_target = True

    def assert_cfg(self):
        assert self.cfg.dataset.target.pseudo_dir or "target" in self.datasets, (
            "pseudo_dir must be set for self-training"
        )

    def make_step(self):
        return S.make_self_training_step(self.segmentor, self.tx)

    def next_batch(self):
        b = next(self.t_stream)
        return {"t_img": b["images"], "t_plbl": b["labels"]}  # uint8; cast on device


@TRAINER.register("ConsistencySelfTrainingTrainer")
class ConsistencySelfTrainingTrainer(SelfTrainingTrainer):
    """The full HIAST trainer: EMA teacher + on-device strong view + HPA
    copy-paste (reference consistency_self_training_trainer.py)."""

    def assert_cfg(self):
        from hiast_tpu.registry import PREPROCESSOR

        super().assert_cfg()
        assert self.cfg.cst_training.is_enabled
        # A falsy type means PLAIN consistency self-training (no copy-paste)
        # — a documented superset: the reference hard-requires CopyPaste here
        # (consistency_self_training_trainer.py:25)
        assert not self.cfg.preprocessor.type or (
            self.cfg.preprocessor.type in PREPROCESSOR
        ), f"unknown preprocessor {self.cfg.preprocessor.type!r}"

    def extra_state(self, variables):
        return {"ema_params": jax.jit(lambda p: jax.tree.map(jnp.copy, p))(variables["params"])}

    def build_all_model(self):
        super().build_all_model()
        self.ema_recorder = ResultRecorder(
            self.cfg, "ema_model", self.logger, self.writer, self.lr_fn
        )

    def build_train_data_reader(self):
        cfg = self.cfg
        ds = self.datasets.get("target") or build_dataset(
            cfg, "target", pseudo_dir=cfg.dataset.target.pseudo_dir
        )
        # wire hard-aware copy-paste with the previous round's class stats
        # (reference consistency trainer :27-44)
        pseudo_dir = cfg.dataset.target.pseudo_dir
        class_value = None
        if pseudo_dir:
            cmp_path = os.path.join(
                os.path.dirname(os.path.normpath(pseudo_dir)), "class_mean_probabilities.npy"
            )
            if os.path.exists(cmp_path):
                class_value = np.load(cmp_path)
        if cfg.preprocessor.type == "CopyPaste" and not ds.get_samples_with_class():
            # The reference FAILS here too (base_dataset.py:61-77 +
            # consistency_self_training_trainer.py:27-44 raise on the missing
            # stats files) — silently skipping would train a "HIAST" round
            # that is actually plain consistency self-training.
            raise FileNotFoundError(
                "preprocessor.type=CopyPaste but the target dataset has no "
                "samples_with_class stats: expected samples_with_class.json "
                f"next to pseudo_dir={pseudo_dir!r} (produced by the "
                "pseudo-label generation round). Point dataset.target."
                "pseudo_dir at a generated round, or set preprocessor.type "
                "to 'none' for plain consistency self-training."
            )
        if class_value is None:
            if cfg.preprocessor.type == "CopyPaste":
                self.logger.warning(
                    "class_mean_probabilities.npy not found next to "
                    f"pseudo_dir={pseudo_dir!r}: HPA hard-class weighting "
                    "falls back to uniform (class_value=0.9); the reference "
                    "requires this file (consistency trainer :29-30)"
                )
            class_value = np.full(cfg.dataset.num_classes, 0.9, np.float32)
        if cfg.preprocessor.type:
            from hiast_tpu.registry import PREPROCESSOR

            ds.set_preprocessor(
                PREPROCESSOR[cfg.preprocessor.type](cfg, ds, class_value)
            )
        self.t_dataset = ds
        self.t_stream = infinite_batches(
            ds, self._local_batch(), seed=self._stream_seed(1),
            num_workers=self._workers(),
        )

    def next_batch(self):
        b = next(self.t_stream)
        out = {"t_img": b["images"], "t_plbl": b["labels"]}  # uint8; cast on device
        if self.cfg.cst_training.dcst_loss.weight > 0 and "copy_paste_mask" in b:
            out["copy_paste_mask"] = b["copy_paste_mask"]
        return out

    def make_step(self):
        # strong view kind: from cfg aug list (['MS','CCA'] -> CCA on device),
        # falling back to an injected dataset's device_color_aug attribute
        from hiast_tpu.data.augment import split_aug_types

        _, strong = split_aug_types(list(self.cfg.dataset.target.aug_type))
        if strong is None and "target" in self.datasets:
            strong = getattr(self.datasets["target"], "device_color_aug", None)
        return S.make_consistency_step(self.segmentor, self.tx, strong_aug=strong)

    def validate(self, iteration: int):
        super().validate(iteration)  # student validation + checkpoint
        # EMA model validated too (reference :85-87)
        val_iter = BatchIterator(
            self.v_dataset, self.cfg.validate.batch_size, shuffle=False, drop_last=False
        )
        ema_iou, ema_miou = run_validation(
            self.val_step, self.state.ema_params, self.state.batch_stats, val_iter,
            mesh=self.mesh,
        )
        self.ema_recorder.record_and_report_metrics(ema_miou, ema_iou, iteration)

    def save_checkpoint(self, iteration: int, is_best: bool):
        super().save_checkpoint(iteration, is_best)
        # <ema_model_last> weights-only artifact alongside every student save
        # (reference :156-158) — also written by the final/preemption saves,
        # so the run_rounds EMA->pseudo handoff never sees a stale teacher
        from hiast_tpu.utils.checkpoint import save_train_state

        save_train_state(
            self.ckpt.ckpt_dir,
            "ema_model_last",
            {"params": self.state.ema_params, "batch_stats": self.state.batch_stats},
        )

    def run(self):
        super().run()
        self.ema_recorder.report_end_info()


@TRAINER.register("MutualLearningTrainer")
class MutualLearningTrainer(SelfTrainingTrainer):
    """Two students co-train on pseudo labels, each matching the other's soft
    prediction (the reference's latent ``mut_training`` surface,
    code/utils/default_config.py:159-167; loss protocol from the vestigial
    compute_mutual_loss, self_training_segmentor.py:55-61).  Both students
    run in ONE jit program; the peer resumes from ``mut_training.resume_from``
    when set, else from an independent random init."""

    def assert_cfg(self):
        super().assert_cfg()
        assert self.cfg.mut_training.is_enabled, "mut_training.is_enabled required"
        assert self.cfg.mut_training.mut_loss.weight > 0

    def extra_state(self, variables):
        cfg = self.cfg
        peer = self.segmentor.init_variables(
            jax.random.PRNGKey(cfg.train.random_seed + 13)
        )
        peer = {"params": peer["params"], "batch_stats": peer["batch_stats"]}
        if cfg.mut_training.resume_from:
            peer = load_weights(cfg.mut_training.resume_from, peer)
            self.logger.info(f"peer resumed weights from {cfg.mut_training.resume_from}")
        return {
            "peer_params": peer["params"],
            "peer_batch_stats": peer["batch_stats"],
            "peer_opt_state": jax.jit(self.tx.init)(peer["params"]),
        }

    def build_all_model(self):
        super().build_all_model()
        self.peer_recorder = ResultRecorder(
            self.cfg, "peer_model", self.logger, self.writer, self.lr_fn
        )

    def make_step(self):
        from hiast_tpu.data.augment import split_aug_types

        _, strong = split_aug_types(list(self.cfg.dataset.target.aug_type))
        return S.make_mutual_step(self.segmentor, self.tx, strong_aug=strong)

    def checkpoint_tree(self) -> dict:
        tree = super().checkpoint_tree()
        tree["peer_params"] = self.state.peer_params
        tree["peer_batch_stats"] = self.state.peer_batch_stats
        tree["peer_opt_state"] = self.state.peer_opt_state
        return tree

    def validate(self, iteration: int):
        super().validate(iteration)
        cfg = self.cfg
        val_iter = BatchIterator(
            self.v_dataset, cfg.validate.batch_size, shuffle=False, drop_last=False
        )
        iou, miou = run_validation(
            self.val_step, self.state.peer_params, self.state.peer_batch_stats,
            val_iter, mesh=self.mesh,
        )
        self.peer_recorder.record_and_report_metrics(miou, iou, iteration)

    def run(self):
        super().run()
        self.peer_recorder.report_end_info()


@TRAINER.register("AdversarialWarmupTrainer")
class AdversarialWarmupTrainer(BaseTrainer):
    needs_source = True
    needs_target = True

    def assert_cfg(self):
        assert self.cfg.model.discriminator.is_enabled

    def extra_state(self, variables):
        ch, cw = self.cfg.dataset.crop_size
        d_vars = self.segmentor.init_d_variables(
            jax.random.PRNGKey(self.cfg.train.random_seed + 7), (1, ch, cw, None)
        )
        self.d_tx = make_d_optimizer(self.cfg)
        return {"d_params": d_vars, "d_opt_state": self.d_tx.init(d_vars)}

    def make_step(self):
        return S.make_adversarial_step(self.segmentor, self.tx, self.d_tx)

    def next_batch(self):
        s = next(self.s_stream)
        t = next(self.t_stream)
        return {
            "s_img": s["images"],
            "s_lbl": s["labels"],  # uint8; cast on device
            "t_img": t["images"],
        }

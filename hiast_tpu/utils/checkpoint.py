"""Checkpointing: Orbax for full train state, .pth interop for the ecosystem.

A strict superset of the reference's weights-only ``.pth`` saves (reference:
code/workflows/trainer/base_trainer.py:188-198, SURVEY §5.4 notes the
inability to resume optimizer state as a known weakness): Orbax checkpoints
carry (params, batch_stats, ema_params, opt_state, step, IAS state), while
``export_pth`` / ``load_weights`` keep the published PyTorch checkpoints
usable as inputs and outputs.

Save policy mirrors the reference: ``<name>_last`` every validation,
``<name>_best`` on best mIoU, ``<name>_mid`` once past half the iterations,
optional per-iteration saves.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(ckpt_dir: str, name: str, state_tree: Any) -> None:
    """Atomic full-state save to <ckpt_dir>/<name> (overwrites)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        ckptr.save(tmp, jax.tree.map(np.asarray, state_tree))
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_train_state(ckpt_dir: str, name: str, target: Any) -> Any:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def load_step(ckpt_dir: str, name: str = "model_last") -> int | None:
    """Read ONLY the ``step`` scalar from a full-state checkpoint (a partial
    Orbax restore — no parameter arrays touch memory).  Returns None when the
    path is missing, not an Orbax dir, or carries no step (weights-only) —
    the round driver uses this to decide skip / resume / fresh-start
    (cli/run_rounds.py) without paying a full restore per probe."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if not os.path.isdir(path):
        return None
    ocp = _ocp()
    try:
        restored = ocp.PyTreeCheckpointer().restore(
            path,
            args=ocp.args.PyTreeRestore(
                item={"step": np.zeros((), np.int32)}, partial_restore=True
            ),
        )
        return int(np.asarray(restored["step"]))
    except Exception:  # noqa: BLE001 - absent/weights-only/corrupt: no step
        return None


def load_weights(path: str, target_variables: Any | None = None) -> dict:
    """Weights-only load from either a torch ``.pth`` or an Orbax directory.

    Mirrors the partial / prefix-tolerant semantics of the reference's
    ``load_model`` (code/utils/utils.py:68-89): keys are intersected with the
    target tree when one is provided.
    """
    if os.path.isdir(path):
        ocp = _ocp()
        with ocp.StandardCheckpointer() as ckptr:
            loaded = ckptr.restore(path)
        variables = {
            k: loaded[k] for k in ("params", "batch_stats") if k in loaded
        }
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        if any(k.split("module.")[-1].startswith("segformer.") for k in state):
            # HuggingFace transformers Segformer layout (Hub checkpoints)
            from hiast_tpu.models.convert_segformer import hf_segformer_state_dict_to_flax

            variables = hf_segformer_state_dict_to_flax(state)
        elif any(k.split("module.")[-1].startswith("backbone.patch_embed") for k in state):
            # official MiT / mmseg SegFormer layout
            from hiast_tpu.models.convert_segformer import mit_state_dict_to_flax

            variables = mit_state_dict_to_flax(state)
        else:
            from hiast_tpu.models.convert import torch_state_dict_to_flax

            variables = torch_state_dict_to_flax(state)
    if target_variables is not None:
        variables = merge_intersecting(target_variables, variables, origin=path)
    return variables


def merge_intersecting(target: Any, source: Any, *, origin: str = "checkpoint") -> Any:
    """Copy source leaves into target wherever paths+shapes match.

    Loud partial-load semantics (the reference prints what it loaded,
    code/utils/utils.py:85): the matched/unmatched counts are logged, and a
    load where NOTHING matches — e.g. a wrong-layout file — raises instead of
    silently returning the target unchanged.
    """
    matched: list = []
    skipped: list = []

    def merge(t, s, path):
        if isinstance(t, dict):
            return {
                k: merge(t[k], s[k], path + (k,))
                if isinstance(s, dict) and k in s
                else t[k]
                for k in t
            }
        if s is None:
            return t
        s_arr = np.asarray(s)
        if tuple(np.shape(t)) == tuple(s_arr.shape):
            matched.append(path)
            # dtype/shape are metadata: never np.asarray(t) here — the target
            # leaves may live on device, and fetching each one D2H makes every
            # checkpoint load scale with the transfer link (minutes through a
            # slow tunnel), for values we throw away.
            t_dtype = getattr(t, "dtype", None)
            return s_arr.astype(t_dtype if t_dtype is not None else np.asarray(t).dtype)
        skipped.append((path, tuple(s_arr.shape), tuple(np.shape(t))))
        return t

    out = merge(target, source, ())
    n_target = len(jax.tree.leaves(target))
    import logging

    log = logging.getLogger("hiast_tpu")
    log.info(
        "load %s: matched %d / %d target leaves (%d shape-mismatched)",
        origin, len(matched), n_target, len(skipped),
    )
    for path, got, want in skipped[:10]:
        log.warning("  shape mismatch at %s: ckpt %s vs model %s", "/".join(path), got, want)
    if not matched:
        raise ValueError(
            f"checkpoint {origin!r} shares no parameter with the target model "
            f"(0 of {n_target} leaves matched) — wrong layout or wrong model"
        )
    return out


def export_pth(path: str, variables: Any) -> None:
    """Write a torch-state_dict-compatible .pth from Flax variables."""
    import torch

    from hiast_tpu.models.convert import flax_to_torch_state_dict

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch_state_dict(jax.tree.map(np.asarray, variables)).items()
    }
    torch.save(sd, path)


class CheckpointPolicy:
    """last / best / mid / per-iter save policy (reference base_trainer.py:188-198).

    ``keep`` bounds the per-iteration saves (``is_save_all``): only the
    newest ``keep`` <name>_iter_* checkpoints survive; last/best/mid are
    never pruned.  The reference keeps every per-iter save — at ~170 MB of
    fp32 params each, a 3-round run fills a disk; pruning is the superset
    behavior with a bound.
    """

    def __init__(
        self, ckpt_dir: str, total_iter: int, is_save_all: bool = False, keep: int = 3
    ):
        self.ckpt_dir = ckpt_dir
        self.total_iter = total_iter
        self.is_save_all = is_save_all
        self.keep = keep
        os.makedirs(ckpt_dir, exist_ok=True)
        self._mid_saved = False

    def _prune_iter_saves(self, name: str) -> None:
        import re
        import shutil

        pat = re.compile(rf"^{re.escape(name)}_iter_(\d+)$")
        found = []
        for entry in os.listdir(self.ckpt_dir):
            m = pat.match(entry)
            if m:
                found.append((int(m.group(1)), entry))
        for _, entry in sorted(found)[: max(0, len(found) - self.keep)]:
            shutil.rmtree(os.path.join(self.ckpt_dir, entry))

    def save(self, name: str, state_tree: Any, iteration: int, is_best: bool) -> None:
        if self.is_save_all:
            save_train_state(self.ckpt_dir, f"{name}_iter_{iteration}", state_tree)
            if self.keep and self.keep > 0:
                self._prune_iter_saves(name)
        save_train_state(self.ckpt_dir, f"{name}_last", state_tree)
        if is_best:
            save_train_state(self.ckpt_dir, f"{name}_best", state_tree)
        if iteration >= self.total_iter // 2 and not self._mid_saved:
            save_train_state(self.ckpt_dir, f"{name}_mid", state_tree)
            self._mid_saved = True

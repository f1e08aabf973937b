"""Component registries.

The reference wires pluggable components through global registries populated
at import time (reference: code/utils/registry/registry.py:1-43,
code/utils/registry/registries.py:3-9).  We keep the same public surface —
``LOSS['CE']``, ``TRAINER['SelfTrainingTrainer']`` — because it is the
extension mechanism users of the reference rely on.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable


class Registry(dict):
    """A name -> component mapping with a ``register`` decorator."""

    def __init__(self, name: str):
        super().__init__()
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    def register(self, key: str | None = None, obj: Any = None):
        if obj is not None:  # direct call: REG.register('name', thing)
            self._set(key, obj)
            return obj

        def decorator(fn_or_cls):
            self._set(key or fn_or_cls.__name__, fn_or_cls)
            return fn_or_cls

        return decorator

    def _set(self, key: str, obj: Any) -> None:
        if key in self:
            raise KeyError(f"{key!r} already registered in {self._name}")
        self[key] = obj

    def __missing__(self, key):
        known = ", ".join(sorted(self))
        raise KeyError(f"{key!r} not found in registry {self._name!r} (known: {known})")


# The seven registries of the reference (code/utils/registry/registries.py:3-9).
LOSS = Registry("loss")
DATASET = Registry("dataset")
MODEL = Registry("model")
TRAINER = Registry("trainer")
PSEUDO_POLICY = Registry("pseudo_policy")
PREPROCESSOR = Registry("preprocessor")
SEG_MODEL = Registry("seg_model")


def populate() -> None:
    """Import every pluggable module for side-effect registration.

    Mirrors reference code/utils/registry/register.py:3-9: entry points call
    this once so that config-named components resolve.
    """
    import importlib

    for mod in (
        "hiast_tpu.ops.losses",
        "hiast_tpu.models.deeplab_v2",
        "hiast_tpu.models.deeplab_v3plus",
        "hiast_tpu.models.segformer",
        "hiast_tpu.models.segmentors",
        "hiast_tpu.data.datasets",
        "hiast_tpu.data.copy_paste",
        "hiast_tpu.pseudo.generator",
        "hiast_tpu.selftrain.trainers",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # tolerate not-yet-built subsystems during incremental bring-up
            if e.name and e.name.startswith("hiast_tpu"):
                continue
            raise

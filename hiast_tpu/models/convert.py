"""torch ``.pth`` <-> Flax parameter conversion.

The reference ecosystem ships warmup / final checkpoints as raw PyTorch
``state_dict`` files (reference: code/utils/utils.py:68-89, README.md:97-99);
this module converts them losslessly to/from our Flax variable tree so those
artifacts remain usable as training inputs and for golden-value parity tests.

Key mapping (torch -> flax):
    backbone.layer3.5.conv2.weight -> params/backbone/layer3_5/conv2/kernel
    backbone.bn1.weight/bias       -> params/backbone/bn1/scale|bias
    backbone.bn1.running_mean|var  -> batch_stats/backbone/bn1/mean|var
    backbone.layerL.B.downsample.0 -> .../downsample_conv
    backbone.layerL.B.downsample.1 -> .../downsample_bn
    aspp.conv2d_list.I             -> aspp/conv2d_list_I
    representation.0               -> representation
    D.convN / D.classifier         -> D/convN, D/classifier
Conv kernels transpose OIHW -> HWIO.

A raw torchvision ResNet checkpoint (``resnet101-*.pth``: prefix-less
``conv1.weight`` / ``layer1.0...`` keys plus ``fc.*``) is detected and mapped
into the ``backbone.`` namespace with the classifier head dropped — the same
ImageNet initialization the reference performs at model build (reference:
code/sseg/models/modules/resnet.py:193-214).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

_TORCHVISION_DROP = ("fc.",)


def is_torchvision_resnet_layout(keys) -> bool:
    """True for a bare torchvision ResNet state_dict (no HIAST namespaces)."""
    bare = {k.split("module.", 1)[-1] for k in keys}
    if not any(k.startswith("conv1.") for k in bare):
        return False
    return not any(
        k.startswith(("backbone.", "seg_model.", "aspp.", "representation.", "D."))
        for k in bare
    )


def _rewrite_torchvision_keys(state_dict: Mapping) -> dict:
    """conv1/layer*/bn1 -> backbone.*, drop the ImageNet classifier head."""
    out = {}
    for k, v in state_dict.items():
        bare = k.split("module.", 1)[-1]
        if bare.startswith(_TORCHVISION_DROP):
            continue
        out[f"backbone.{bare}"] = v
    return out


def _flax_path(torch_key: str) -> tuple[str, ...] | None:
    """Translate one torch state_dict key to a flax tree path (collection-relative)."""
    key = torch_key
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("seg_model."):
        key = key[len("seg_model."):]

    # torch sequential indices -> named flax modules
    key = re.sub(r"layer(\d+)\.(\d+)\.", r"layer\1_\2.", key)
    key = key.replace("downsample.0.", "downsample_conv.")
    key = key.replace("downsample.1.", "downsample_bn.")
    key = re.sub(r"conv2d_list\.(\d+)\.", r"conv2d_list_\1.", key)
    key = key.replace("representation.0.", "representation.")
    if key.startswith("D."):
        key = "D." + key[2:]
    parts = key.split(".")
    if parts[-1] in ("num_batches_tracked",):
        return None
    return tuple(parts)


def torch_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Build {'params': ..., 'batch_stats': ...} from a torch state_dict.

    Accepts tensors or numpy arrays; returns numpy arrays (cast to float32).
    """
    if is_torchvision_resnet_layout(state_dict.keys()):
        state_dict = _rewrite_torchvision_keys(state_dict)
    params: Dict = {}
    batch_stats: Dict = {}

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for torch_key, tensor in state_dict.items():
        path = _flax_path(torch_key)
        if path is None:
            continue
        # np.array (not asarray): torch's .numpy() is a zero-copy VIEW of the
        # tensor storage, and jnp.asarray on CPU can alias numpy buffers too —
        # without the copy, later in-place torch updates (optimizer steps, BN
        # running stats) would silently mutate the converted variables.
        arr = np.array(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor,
            dtype=np.float32,
        )
        leaf = path[-1]
        mod_path = path[:-1]
        is_bn = bool(re.search(r"(^|_)bn\d*$", mod_path[-1])) or mod_path[-1].endswith(
            "downsample_bn"
        )
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                insert(params, mod_path + ("kernel",), arr.transpose(2, 3, 1, 0))
            elif is_bn:
                insert(params, mod_path + ("scale",), arr)
            else:
                insert(params, mod_path + ("kernel",), arr.T)
        elif leaf == "bias":
            insert(params, mod_path + ("bias",), arr)
        elif leaf == "running_mean":
            insert(batch_stats, mod_path + ("mean",), arr)
        elif leaf == "running_var":
            insert(batch_stats, mod_path + ("var",), arr)
        else:
            raise KeyError(f"unhandled torch leaf {torch_key!r}")
    return {"params": params, "batch_stats": batch_stats}


def load_pth_to_flax(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return torch_state_dict_to_flax(state)


def flax_to_torch_state_dict(variables: Mapping) -> dict:
    """Inverse mapping (for exporting checkpoints back to the .pth ecosystem)."""
    out = {}

    def walk(tree, prefix, collection):
        for name, value in tree.items():
            if isinstance(value, Mapping):
                walk(value, prefix + (name,), collection)
                continue
            arr = np.asarray(value)
            mod = prefix
            torch_mod = ".".join(mod)
            torch_mod = re.sub(r"layer(\d+)_(\d+)", r"layer\1.\2", torch_mod)
            torch_mod = torch_mod.replace("downsample_conv", "downsample.0")
            torch_mod = torch_mod.replace("downsample_bn", "downsample.1")
            torch_mod = re.sub(r"conv2d_list_(\d+)", r"conv2d_list.\1", torch_mod)
            if torch_mod.endswith("representation"):
                torch_mod += ".0"
            if name == "kernel":
                if arr.ndim == 4:
                    out[f"{torch_mod}.weight"] = arr.transpose(3, 2, 0, 1)
                else:
                    out[f"{torch_mod}.weight"] = arr.T
            elif name == "scale":
                out[f"{torch_mod}.weight"] = arr
            elif name == "bias":
                out[f"{torch_mod}.bias"] = arr
            elif name == "mean":
                out[f"{torch_mod}.running_mean"] = arr
            elif name == "var":
                out[f"{torch_mod}.running_var"] = arr
            else:
                raise KeyError(f"unhandled flax leaf {name!r} at {torch_mod}")

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return out

"""SegFormer checkpoint conversion: official MiT / mmseg ``.pth`` -> Flax.

Maps the NVlabs-SegFormer / mmseg state-dict layout onto models/segformer.py:

    backbone.patch_embed{s}.proj|norm      -> backbone/patch_embed{s}/proj|norm
    backbone.block{s}.{i}.norm1|norm2      -> backbone/block{s}_{i}/...
    backbone.block{s}.{i}.attn.q           -> .../attn/q
    backbone.block{s}.{i}.attn.kv          -> SPLIT into .../attn/k and /attn/v
    backbone.block{s}.{i}.attn.proj|sr     -> .../attn/proj|sr
    backbone.block{s}.{i}.attn.norm        -> .../attn/sr_norm
    backbone.block{s}.{i}.mlp.fc1|fc2      -> .../ffn/fc1|fc2
    backbone.block{s}.{i}.mlp.dwconv.dwconv-> .../ffn/dwconv (depthwise)
    backbone.norm{s}                       -> backbone/norm{s}
    decode_head.linear_c{k}.proj           -> decode_head/linear_c{k}
    decode_head.linear_fuse.conv|bn        -> decode_head/fuse + fuse_bn
    decode_head.linear_pred                -> decode_head/classifier

Conventions: conv OIHW -> HWIO (depthwise [C,1,k,k] -> [k,k,1,C]), linear
[out,in] -> [in,out], LN weight/bias -> scale/bias, BN running stats ->
batch_stats.
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _insert(tree: dict, path: tuple, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def mit_state_dict_to_flax(state_dict: Mapping) -> dict:
    params: dict = {}
    batch_stats: dict = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)

    for key, value in state_dict.items():
        v = arr(value)
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue

        # --- encoder ---------------------------------------------------
        m = re.match(r"backbone\.patch_embed(\d)\.(proj|norm)\.(weight|bias)", k)
        if m:
            s, sub, leaf = m.groups()
            base = ("backbone", f"patch_embed{s}", sub)
            if sub == "proj":
                _insert(params, base + ("kernel" if leaf == "weight" else "bias",),
                        v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
            else:  # LayerNorm
                _insert(params, base + ("scale" if leaf == "weight" else "bias",), v)
            continue

        m = re.match(r"backbone\.block(\d)\.(\d+)\.(.+)", k)
        if m:
            s, i, rest = m.groups()
            base = ("backbone", f"block{s}_{i}")
            if re.match(r"norm[12]\.(weight|bias)", rest):
                sub, leaf = rest.split(".")
                _insert(params, base + (sub, "scale" if leaf == "weight" else "bias"), v)
            elif rest.startswith("attn.kv."):
                leaf = rest.split(".")[-1]
                half = v.shape[0] // 2
                name = "kernel" if leaf == "weight" else "bias"
                kv_k, kv_v = v[:half], v[half:]
                if leaf == "weight":
                    kv_k, kv_v = kv_k.T, kv_v.T
                _insert(params, base + ("attn", "k", name), kv_k)
                _insert(params, base + ("attn", "v", name), kv_v)
            elif re.match(r"attn\.(q|k|v|proj)\.(weight|bias)", rest):
                _, sub, leaf = rest.split(".")[0], rest.split(".")[1], rest.split(".")[2]
                name = "kernel" if leaf == "weight" else "bias"
                _insert(params, base + ("attn", sub, name), v.T if leaf == "weight" else v)
            elif re.match(r"attn\.sr\.(weight|bias)", rest):
                leaf = rest.split(".")[-1]
                _insert(params, base + ("attn", "sr", "kernel" if leaf == "weight" else "bias"),
                        v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
            elif re.match(r"attn\.norm\.(weight|bias)", rest):
                leaf = rest.split(".")[-1]
                _insert(params, base + ("attn", "sr_norm", "scale" if leaf == "weight" else "bias"), v)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)", rest):
                sub, leaf = rest.split(".")[1], rest.split(".")[2]
                name = "kernel" if leaf == "weight" else "bias"
                _insert(params, base + ("ffn", sub, name), v.T if leaf == "weight" else v)
            elif re.match(r"mlp\.dwconv\.dwconv\.(weight|bias)", rest):
                leaf = rest.split(".")[-1]
                if leaf == "weight":  # depthwise [C,1,k,k] -> [k,k,1,C]
                    _insert(params, base + ("ffn", "dwconv", "kernel"), v.transpose(2, 3, 1, 0))
                else:
                    _insert(params, base + ("ffn", "dwconv", "bias"), v)
            else:
                raise KeyError(f"unhandled MiT block key {key!r}")
            continue

        m = re.match(r"backbone\.norm(\d)\.(weight|bias)", k)
        if m:
            s, leaf = m.groups()
            _insert(params, ("backbone", f"norm{s}", "scale" if leaf == "weight" else "bias"), v)
            continue

        # --- decode head -------------------------------------------------
        m = re.match(r"decode_head\.linear_c(\d)\.proj\.(weight|bias)", k)
        if m:
            c, leaf = m.groups()
            name = "kernel" if leaf == "weight" else "bias"
            _insert(params, ("decode_head", f"linear_c{c}", name), v.T if leaf == "weight" else v)
            continue
        if k.startswith("decode_head.linear_fuse.conv."):
            _insert(params, ("decode_head", "fuse", "kernel"), v.transpose(2, 3, 1, 0))
            continue
        m = re.match(r"decode_head\.linear_fuse\.bn\.(weight|bias|running_mean|running_var)", k)
        if m:
            leaf = m.group(1)
            if leaf in ("weight", "bias"):
                _insert(params, ("decode_head", "fuse_bn", "scale" if leaf == "weight" else "bias"), v)
            else:
                _insert(batch_stats, ("decode_head", "fuse_bn", "mean" if leaf == "running_mean" else "var"), v)
            continue
        m = re.match(r"decode_head\.linear_pred\.(weight|bias)", k)
        if m:
            leaf = m.group(1)
            if leaf == "weight":
                _insert(params, ("decode_head", "classifier", "kernel"), v.transpose(2, 3, 1, 0))
            else:
                _insert(params, ("decode_head", "classifier", "bias"), v)
            continue
        if k.startswith(("decode_head.conv_seg", "auxiliary_head", "head.")):
            continue  # mmseg extras not used by this head
        raise KeyError(f"unhandled SegFormer key {key!r}")

    return {"params": params, "batch_stats": batch_stats}


def hf_segformer_state_dict_to_flax(state_dict: Mapping) -> dict:
    """HuggingFace ``transformers`` Segformer layout -> Flax.

    Hub checkpoints (e.g. ``nvidia/segformer-b5-finetuned-cityscapes``) use
    ``segformer.encoder.*`` keys with separate ``key``/``value`` projections;
    this adapter renames them into the NVlabs/mmseg layout (fusing key+value
    back into the ``kv`` projection) and reuses ``mit_state_dict_to_flax``.
    """

    def arr(v):
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
        )

    mit: dict = {}
    kv_halves: dict = {}

    block_renames = {
        "layer_norm_1": "norm1",
        "layer_norm_2": "norm2",
        "attention.self.query": "attn.q",
        "attention.self.sr": "attn.sr",
        "attention.self.layer_norm": "attn.norm",
        "attention.output.dense": "attn.proj",
        "mlp.dense1": "mlp.fc1",
        "mlp.dense2": "mlp.fc2",
        "mlp.dwconv.dwconv": "mlp.dwconv.dwconv",
    }

    for key, value in state_dict.items():
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue

        m = re.match(
            r"segformer\.encoder\.patch_embeddings\.(\d+)\.(proj|layer_norm)\.(weight|bias)", k
        )
        if m:
            i, sub, leaf = m.groups()
            sub = "proj" if sub == "proj" else "norm"
            mit[f"backbone.patch_embed{int(i) + 1}.{sub}.{leaf}"] = arr(value)
            continue
        m = re.match(r"segformer\.encoder\.block\.(\d+)\.(\d+)\.(.+)", k)
        if m:
            s, j, rest = m.groups()
            base = f"backbone.block{int(s) + 1}.{j}"
            mkv = re.match(r"attention\.self\.(key|value)\.(weight|bias)", rest)
            if mkv:
                which, leaf = mkv.groups()
                kv_halves.setdefault((base, leaf), {})[which] = arr(value)
                continue
            sub, leaf = rest.rsplit(".", 1)
            if sub not in block_renames:
                raise KeyError(f"unhandled HF SegFormer block key {key!r}")
            mit[f"{base}.{block_renames[sub]}.{leaf}"] = arr(value)
            continue
        m = re.match(r"segformer\.encoder\.layer_norm\.(\d+)\.(weight|bias)", k)
        if m:
            i, leaf = m.groups()
            mit[f"backbone.norm{int(i) + 1}.{leaf}"] = arr(value)
            continue
        m = re.match(r"decode_head\.linear_c\.(\d+)\.proj\.(weight|bias)", k)
        if m:
            i, leaf = m.groups()
            mit[f"decode_head.linear_c{int(i) + 1}.proj.{leaf}"] = arr(value)
            continue
        if k == "decode_head.linear_fuse.weight":
            mit["decode_head.linear_fuse.conv.weight"] = arr(value)
            continue
        m = re.match(r"decode_head\.batch_norm\.(weight|bias|running_mean|running_var)", k)
        if m:
            mit[f"decode_head.linear_fuse.bn.{m.group(1)}"] = arr(value)
            continue
        m = re.match(r"decode_head\.classifier\.(weight|bias)", k)
        if m:
            mit[f"decode_head.linear_pred.{m.group(1)}"] = arr(value)
            continue
        raise KeyError(f"unhandled HF SegFormer key {key!r}")

    # fuse the separate key/value projections back into the MiT kv layout
    # (the mit converter splits kv as [key; value] along the output axis)
    for (base, leaf), halves in kv_halves.items():
        assert set(halves) == {"key", "value"}, (base, leaf, set(halves))
        mit[f"{base}.attn.kv.{leaf}"] = np.concatenate(
            [halves["key"], halves["value"]], axis=0
        )

    return mit_state_dict_to_flax(mit)


def load_mit_pth_to_flax(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if any(k.split("module.")[-1].startswith("segformer.") for k in state):
        return hf_segformer_state_dict_to_flax(state)
    return mit_state_dict_to_flax(state)

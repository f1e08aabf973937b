"""SegFormer (MiT/mmseg) checkpoint converter: structural + numeric
round-trip against the Flax tree, through a synthetic mmseg-layout dict."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiast_tpu.models.convert_segformer import mit_state_dict_to_flax
from hiast_tpu.models.segformer import SegFormer


def flax_to_mit_state_dict(variables):
    """Inverse mapping (test-only): emit the official MiT naming from a Flax
    tree so the converter can be validated without a real checkpoint."""
    sd = {}
    p = variables["params"]
    bb = p["backbone"]
    for name, sub in bb.items():
        if name.startswith("patch_embed"):
            sd[f"backbone.{name}.proj.weight"] = np.asarray(sub["proj"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"backbone.{name}.proj.bias"] = np.asarray(sub["proj"]["bias"])
            sd[f"backbone.{name}.norm.weight"] = np.asarray(sub["norm"]["scale"])
            sd[f"backbone.{name}.norm.bias"] = np.asarray(sub["norm"]["bias"])
        elif re.match(r"block\d_\d+", name):
            s, i = name[5], name.split("_")[1]
            base = f"backbone.block{s}.{i}"
            for ln in ("norm1", "norm2"):
                sd[f"{base}.{ln}.weight"] = np.asarray(sub[ln]["scale"])
                sd[f"{base}.{ln}.bias"] = np.asarray(sub[ln]["bias"])
            attn = sub["attn"]
            sd[f"{base}.attn.q.weight"] = np.asarray(attn["q"]["kernel"]).T
            sd[f"{base}.attn.q.bias"] = np.asarray(attn["q"]["bias"])
            kw = np.concatenate([np.asarray(attn["k"]["kernel"]).T, np.asarray(attn["v"]["kernel"]).T], axis=0)
            kb = np.concatenate([np.asarray(attn["k"]["bias"]), np.asarray(attn["v"]["bias"])], axis=0)
            sd[f"{base}.attn.kv.weight"] = kw
            sd[f"{base}.attn.kv.bias"] = kb
            sd[f"{base}.attn.proj.weight"] = np.asarray(attn["proj"]["kernel"]).T
            sd[f"{base}.attn.proj.bias"] = np.asarray(attn["proj"]["bias"])
            if "sr" in attn:
                sd[f"{base}.attn.sr.weight"] = np.asarray(attn["sr"]["kernel"]).transpose(3, 2, 0, 1)
                sd[f"{base}.attn.sr.bias"] = np.asarray(attn["sr"]["bias"])
                sd[f"{base}.attn.norm.weight"] = np.asarray(attn["sr_norm"]["scale"])
                sd[f"{base}.attn.norm.bias"] = np.asarray(attn["sr_norm"]["bias"])
            ffn = sub["ffn"]
            sd[f"{base}.mlp.fc1.weight"] = np.asarray(ffn["fc1"]["kernel"]).T
            sd[f"{base}.mlp.fc1.bias"] = np.asarray(ffn["fc1"]["bias"])
            sd[f"{base}.mlp.dwconv.dwconv.weight"] = np.asarray(ffn["dwconv"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{base}.mlp.dwconv.dwconv.bias"] = np.asarray(ffn["dwconv"]["bias"])
            sd[f"{base}.mlp.fc2.weight"] = np.asarray(ffn["fc2"]["kernel"]).T
            sd[f"{base}.mlp.fc2.bias"] = np.asarray(ffn["fc2"]["bias"])
        elif re.match(r"norm\d", name):
            sd[f"backbone.{name}.weight"] = np.asarray(sub["scale"])
            sd[f"backbone.{name}.bias"] = np.asarray(sub["bias"])
        else:
            raise KeyError(name)
    head = p["decode_head"]
    for c in range(1, 5):
        sd[f"decode_head.linear_c{c}.proj.weight"] = np.asarray(head[f"linear_c{c}"]["kernel"]).T
        sd[f"decode_head.linear_c{c}.proj.bias"] = np.asarray(head[f"linear_c{c}"]["bias"])
    sd["decode_head.linear_fuse.conv.weight"] = np.asarray(head["fuse"]["kernel"]).transpose(3, 2, 0, 1)
    sd["decode_head.linear_fuse.bn.weight"] = np.asarray(head["fuse_bn"]["scale"])
    sd["decode_head.linear_fuse.bn.bias"] = np.asarray(head["fuse_bn"]["bias"])
    bs = variables["batch_stats"]["decode_head"]["fuse_bn"]
    sd["decode_head.linear_fuse.bn.running_mean"] = np.asarray(bs["mean"])
    sd["decode_head.linear_fuse.bn.running_var"] = np.asarray(bs["var"])
    sd["decode_head.linear_pred.weight"] = np.asarray(head["classifier"]["kernel"]).transpose(3, 2, 0, 1)
    sd["decode_head.linear_pred.bias"] = np.asarray(head["classifier"]["bias"])
    return sd


def test_hf_segformer_b0_numerical_parity():
    """GOLDEN parity vs the HuggingFace Segformer implementation: a random
    HF SegformerForSemanticSegmentation (B0 defaults = our SegFormer_B0 spec)
    converted through hf_segformer_state_dict_to_flax must reproduce the HF
    logits — certifying SRA attention, Mix-FFN, overlap patch embeds and the
    all-MLP head numerically, not just structurally."""
    import torch
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from hiast_tpu.models.convert_segformer import hf_segformer_state_dict_to_flax

    torch.manual_seed(7)
    hf = SegformerForSemanticSegmentation(SegformerConfig(num_labels=19)).eval()
    # randomize the decode-head BN stats so frozen-stat parity is exercised
    bn = hf.decode_head.batch_norm
    bn.running_mean.data.normal_(0, 0.2)
    bn.running_var.data.uniform_(0.8, 1.5)

    variables = hf_segformer_state_dict_to_flax(hf.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    ours = SegFormer(num_classes=19, variant="B0")

    x = np.random.default_rng(5).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).logits  # [1,19,16,32]
    got = ours.apply(variables, jnp.asarray(x), train=False)["logits"]
    want = np.moveaxis(want.numpy(), 1, -1)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3 * scale)


def test_hf_layout_detected_by_load_weights(tmp_path):
    """A .pth in HF layout routes through the HF adapter in load_weights."""
    import torch
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from hiast_tpu.utils.checkpoint import load_weights

    torch.manual_seed(1)
    hf = SegformerForSemanticSegmentation(SegformerConfig(num_labels=19)).eval()
    pth = str(tmp_path / "hf_b0.pth")
    torch.save(hf.state_dict(), pth)

    model = SegFormer(num_classes=19, variant="B0")
    target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), train=False)
    target = {"params": target["params"], "batch_stats": target["batch_stats"]}
    merged = load_weights(pth, target)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["decode_head"]["classifier"]["bias"]),
        hf.decode_head.classifier.bias.detach().numpy(),
    )


def test_mit_convert_roundtrip_and_forward():
    model = SegFormer(num_classes=19, variant="B0")
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    sd = flax_to_mit_state_dict(variables)
    converted = mit_state_dict_to_flax(sd)

    # identical structure + values as the original Flax tree
    want_paths = {jax.tree_util.keystr(kp) for kp, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    got_paths = {jax.tree_util.keystr(kp) for kp, _ in jax.tree_util.tree_flatten_with_path(converted["params"])[0]}
    assert want_paths == got_paths, want_paths ^ got_paths
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(
            jax.tree.map(jnp.asarray, converted["params"])
        )[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(kp))

    # converted tree drives the model
    out = model.apply(jax.tree.map(jnp.asarray, converted), x, train=False)
    assert out["logits"].shape == (1, 16, 32, 19)

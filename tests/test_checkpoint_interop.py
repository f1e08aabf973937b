"""Checkpoint interop: torchvision ImageNet layout ingestion + loud
partial-load semantics.

The reference initializes its backbone from a raw torchvision
``resnet101-*.pth`` (reference: code/sseg/models/modules/resnet.py:193-214);
these tests certify that a fabricated torchvision-layout state_dict converts
into our ``backbone.`` namespace, reaches a trainer via
``cfg.model.seg_model.pretrained``, and that a wrong-layout file fails loudly
instead of silently no-op loading (reference prints what it loaded,
code/utils/utils.py:85).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hiast_tpu.config import default_config
from hiast_tpu.data.synthetic import SyntheticSegDataset
from hiast_tpu.models.convert import (
    flax_to_torch_state_dict,
    is_torchvision_resnet_layout,
    torch_state_dict_to_flax,
)
from hiast_tpu.models.deeplab_v2 import DeepLabV2
from hiast_tpu.registry import TRAINER, populate
from hiast_tpu.utils.checkpoint import load_weights

populate()

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def tiny_variables():
    model = DeepLabV2(num_classes=19, backbone_layers=TINY)
    variables = model.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 33, 65, 3)), train=False
    )
    return {"params": variables["params"], "batch_stats": variables["batch_stats"]}


@pytest.fixture(scope="module")
def torchvision_state_dict(tiny_variables):
    """A torchvision-layout ResNet state_dict (prefix-less keys + fc head)."""
    sd = flax_to_torch_state_dict(tiny_variables)
    tv = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            tv[k[len("backbone."):]] = torch.from_numpy(np.ascontiguousarray(v))
    # the ImageNet classifier head and BN step counters the converter must drop
    tv["fc.weight"] = torch.zeros(1000, 2048)
    tv["fc.bias"] = torch.zeros(1000)
    tv["bn1.num_batches_tracked"] = torch.zeros((), dtype=torch.long)
    return tv


def test_layout_detection(torchvision_state_dict, tiny_variables):
    assert is_torchvision_resnet_layout(torchvision_state_dict.keys())
    hiast_keys = flax_to_torch_state_dict(tiny_variables).keys()
    assert not is_torchvision_resnet_layout(hiast_keys)


def test_torchvision_roundtrip(torchvision_state_dict, tiny_variables):
    got = torch_state_dict_to_flax(torchvision_state_dict)
    want_backbone = tiny_variables["params"]["backbone"]
    got_backbone = got["params"]["backbone"]
    assert jax.tree.structure(jax.tree.map(np.asarray, got_backbone)) == (
        jax.tree.structure(jax.tree.map(np.asarray, want_backbone))
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got_backbone)[0],
        jax.tree_util.tree_flatten_with_path(want_backbone)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
    np.testing.assert_array_equal(
        np.asarray(got["batch_stats"]["backbone"]["bn1"]["mean"]),
        np.asarray(tiny_variables["batch_stats"]["backbone"]["bn1"]["mean"]),
    )
    assert "fc" not in got["params"]


def test_pretrained_reaches_trainer(tmp_path, torchvision_state_dict, tiny_variables):
    """A source-only trainer initialized from a torchvision-format .pth loads
    the backbone (>0 matched leaves) and trains."""
    pth = str(tmp_path / "resnet_tv.pth")
    torch.save(torchvision_state_dict, pth)

    cfg = default_config()
    cfg.trainer = "SourceOnlyTrainer"
    cfg.model.type = "SourceOnlySegmentor"
    cfg.model.seg_model.pretrained = pth
    cfg.work_dir = str(tmp_path / "work")
    cfg.train.batch_size = 8
    cfg.train.total_iter = 2
    cfg.train.iter_report = 2
    cfg.train.iter_val = 4  # no validation in 2 iters
    cfg.dataset.crop_size = [32, 64]
    cfg.runtime.precision.compute_dtype = "float32"
    train = SyntheticSegDataset(n=16, h=32, w=64, seed=5)
    trainer = TRAINER[cfg.trainer](cfg, datasets={"source": train}, backbone_layers=TINY)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["backbone"]["conv1"]["kernel"]),
        np.asarray(tiny_variables["params"]["backbone"]["conv1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(trainer.state.batch_stats["backbone"]["bn1"]["var"]),
        np.asarray(tiny_variables["batch_stats"]["backbone"]["bn1"]["var"]),
    )
    trainer.run()
    assert int(np.asarray(trainer.state.step)) == 2


def test_wrong_layout_raises(tmp_path, tiny_variables):
    """A checkpoint sharing no keys with the model must fail, not no-op."""
    pth = str(tmp_path / "garbage.pth")
    torch.save({"head.weight": torch.zeros(4, 4), "head.bias": torch.zeros(4)}, pth)
    with pytest.raises(ValueError, match="no parameter"):
        load_weights(pth, tiny_variables)


def test_save_all_keeps_only_newest_k(tmp_path):
    """runtime.checkpoint.keep bounds per-iteration saves; last/best/mid
    are never pruned."""
    from hiast_tpu.utils.checkpoint import CheckpointPolicy

    import os

    policy = CheckpointPolicy(str(tmp_path), total_iter=10, is_save_all=True, keep=2)
    tree = {"w": np.zeros((2,), np.float32)}
    for it in (1, 2, 3, 4):
        policy.save("model", tree, it, is_best=(it == 1))
    names = set(os.listdir(tmp_path))
    assert "model_iter_3" in names and "model_iter_4" in names
    assert "model_iter_1" not in names and "model_iter_2" not in names
    assert {"model_last", "model_best"} <= names


def test_partial_load_logs_counts(tmp_path, torchvision_state_dict, tiny_variables, caplog):
    import logging

    pth = str(tmp_path / "resnet_tv.pth")
    torch.save(torchvision_state_dict, pth)
    with caplog.at_level(logging.INFO, logger="hiast_tpu"):
        load_weights(pth, tiny_variables)
    assert any("matched" in r.message for r in caplog.records)

"""StableHLO serving export: serialize -> deserialize -> call matches the
live forward, the batch dimension is symbolic, and the CLI writes a loadable
artifact."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hiast_tpu.config import default_config
from hiast_tpu.registry import populate

populate()


def tiny_cfg():
    cfg = default_config()
    cfg.model.type = "SourceOnlySegmentor"
    cfg.model.seg_model.backbone_layers = [1, 1, 1, 1]
    return cfg


def test_roundtrip_matches_evaluation_forward():
    """The exported program must match the EVALUATION path (normalize_image
    + forward), not a raw un-normalized forward — a deployed artifact that
    skipped ImageNet normalization would emit garbage predictions."""
    from jax import export

    from hiast_tpu.cli.export_model import build_exported
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.selftrain.steps import make_eval_forward

    cfg = tiny_cfg()
    h, w = 32, 64
    exp = build_exported(cfg, h, w, platforms=("cpu",))
    blob = exp.serialize()
    loaded = export.deserialize(blob)

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    eval_fwd = make_eval_forward(segmentor)

    rng = np.random.default_rng(0)
    for batch in (1, 3):  # symbolic batch dim: two different sizes, one export
        img = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3), dtype=np.uint8))
        got = np.asarray(loaded.call(img))
        want = np.asarray(
            eval_fwd(variables["params"], variables["batch_stats"], img)
        )
        raw = np.asarray(segmentor.forward(variables, img, train=False)["logits"])
        assert got.shape == (batch, h, w, 19)
        # bf16 trunk: two independently-fused programs round differently;
        # bf16 has ~2-3 significant digits, so compare at that scale
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)
        # ... and the export must NOT equal the un-normalized forward
        # (guards against the serve() path dropping normalize_image again)
        assert np.abs(got - raw).max() / scale > 2e-2


def test_multi_platform_export_runs_on_cpu():
    """platforms=('tpu','cpu'): StableHLO lowering for TPU needs no TPU
    hardware (AOT cross-lowering), and the same artifact still executes on
    the CPU backend."""
    from jax import export

    from hiast_tpu.cli.export_model import build_exported

    exp = build_exported(tiny_cfg(), 32, 64, platforms=("tpu", "cpu"))
    assert set(exp.platforms) == {"tpu", "cpu"}
    loaded = export.deserialize(exp.serialize())
    out = loaded.call(jnp.zeros((1, 32, 64, 3), jnp.uint8))
    assert out.shape == (1, 32, 64, 19)


def test_export_cli_writes_artifact(tmp_path):
    import yaml

    from jax import export

    from hiast_tpu.cli import export_model

    cfg_file = tmp_path / "export.yaml"
    cfg_file.write_text(
        yaml.safe_dump(
            {"model": {"type": "SourceOnlySegmentor",
                       "seg_model": {"backbone_layers": [1, 1, 1, 1]}}}
        )
    )
    out = tmp_path / "artifacts" / "model.stablehlo"
    export_model.main([
        "--config_file", str(cfg_file),
        "--output", str(out),
        "--height", "32", "--width", "64",
        "--platforms", "cpu",
    ])
    assert os.path.getsize(out) > 0
    loaded = export.deserialize(out.read_bytes())
    img = jnp.zeros((2, 32, 64, 3), jnp.uint8)
    assert loaded.call(img).shape == (2, 32, 64, 19)

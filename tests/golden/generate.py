"""Regenerate the cached oracle golden render (run from the repo root).

The 256x144 oracle render (tests/oracle.py — an independent NumPy
re-implementation of the reference's compute_render.cu semantics) takes
minutes of scalar Python, so it is rendered once here and committed;
tests/test_render.py::TestGoldenRender::test_reference_scene_256px_cached
compares the full Pallas pipeline against it in seconds.

    PYTHONPATH=.:tests python tests/golden/generate.py
"""
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

import oracle  # noqa: E402
from bsdmg_tpu.cam import look_at  # noqa: E402

W, H = 256, 144
cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
pos = np.asarray(cam.position)
fwd, up, right = map(np.asarray, (cam.forward, cam.up, cam.right))

img = oracle.render(W, H, pos, fwd, up, right, np.pi / 4,
                    screen_w=1920.0, screen_h=1080.0)
out = os.path.join(_HERE, "render_256x144.npz")
np.savez_compressed(out, image=img.astype(np.float32))
print("wrote", out, img.shape, img.dtype)

"""Generate a watertight torus OBJ (procedural test asset for the mesh
pipeline: bake -> contraction render -> 1024^3 remesh)."""
import sys

import numpy as np


def torus(R=1.0, r=0.45, nu=96, nv=64):
    u = np.arange(nu) * (2 * np.pi / nu)
    v = np.arange(nv) * (2 * np.pi / nv)
    U, V = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(V)) * np.cos(U)
    y = r * np.sin(V)
    z = (R + r * np.cos(V)) * np.sin(U)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append((a, c, b))
            faces.append((a, d, c))
    return verts.astype(np.float32), np.asarray(faces, np.int32)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "torus.obj"
    verts, faces = torus()
    with open(out, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    print(f"wrote {out}: {len(verts)} verts, {len(faces)} tris")

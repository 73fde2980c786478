"""Mesh and image export: OBJ, VTK legacy, PNG, and voxel-field checkpoints.

Reference persistence surface: OBJ export of the welded mesh
(src/renderer/mod.rs:204, via the ``obj`` crate) and a hinted VTK path
(``meshx``/``vtkio`` dep in Cargo.toml:22, generated_mesh.vtk in .gitignore).
The voxel-field stage in the reference lives only in RAM; here it
checkpoints to ``.npz`` so long refinements are resumable.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

from bsdmg_tpu.mesh.pipeline import Mesh


# ---------------------------------------------------------------------------
# OBJ
# ---------------------------------------------------------------------------


def save_obj(mesh: Mesh, path: str | Path, *, use_native: bool = True) -> None:
    """Wavefront OBJ with positions + normals, faces as ``v//vn`` (indices
    identical, as the reference asserts in obj_to_bevy_mesh,
    src/renderer/mod.rs:121). Uses the native buffered writer when built."""
    if use_native:
        from bsdmg_tpu.runtime.native import write_obj_native

        if write_obj_native(path, mesh.vertices, mesh.normals, mesh.faces):
            return
    lines = ["# bsdmg_tpu generated mesh"]
    for v in mesh.vertices:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for n in mesh.normals:
        lines.append(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}")
    for f in mesh.faces:
        a, b, c = (int(i) + 1 for i in f)
        lines.append(f"f {a}//{a} {b}//{b} {c}//{c}")
    Path(path).write_text("\n".join(lines) + "\n")


def load_obj(path: str | Path, *, use_native: bool = True) -> Mesh:
    """Minimal OBJ reader: v/vn/f with arbitrary face arity (fan-triangulated).

    Supports the repo's mesh-SDF asset path (reference keeps OBJ assets under
    assets/models/, loadable via bevy_obj). Uses the native C++ parser when
    available (~20x on large assets); the Python path is the fallback and
    the behavioral oracle (tests assert identical output)."""
    if use_native:
        from bsdmg_tpu.runtime.native import read_obj_native

        out = read_obj_native(path)
        if out is not None:
            v, n, f = out
            return Mesh(vertices=v, normals=n, faces=f)
    vertices: list[list[float]] = []
    normals: list[list[float]] = []
    faces: list[tuple[int, int, int]] = []
    for raw in Path(path).read_text().splitlines():
        parts = raw.split()
        if not parts:
            continue
        if parts[0] == "v":
            vertices.append([float(x) for x in parts[1:4]])
        elif parts[0] == "vn":
            normals.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = [int(p.split("/")[0]) for p in parts[1:]]
            idx = [i - 1 if i > 0 else len(vertices) + i for i in idx]
            for k in range(1, len(idx) - 1):
                faces.append((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(vertices, np.float32)
    n = (
        np.asarray(normals, np.float32)
        if len(normals) == len(vertices)
        else np.zeros_like(v)
    )
    return Mesh(vertices=v, normals=n, faces=np.asarray(faces, np.int32))


# ---------------------------------------------------------------------------
# VTK (legacy ASCII PolyData)
# ---------------------------------------------------------------------------


def save_vtk(mesh: Mesh, path: str | Path) -> None:
    """Legacy VTK PolyData with point normals."""
    out = [
        "# vtk DataFile Version 3.0",
        "bsdmg_tpu mesh",
        "ASCII",
        "DATASET POLYDATA",
        f"POINTS {mesh.vertex_count} float",
    ]
    for v in mesh.vertices:
        out.append(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    out.append(f"POLYGONS {mesh.triangle_count} {4 * mesh.triangle_count}")
    for f in mesh.faces:
        out.append(f"3 {int(f[0])} {int(f[1])} {int(f[2])}")
    out.append(f"POINT_DATA {mesh.vertex_count}")
    out.append("NORMALS normals float")
    for n in mesh.normals:
        out.append(f"{n[0]:.6f} {n[1]:.6f} {n[2]:.6f}")
    Path(path).write_text("\n".join(out) + "\n")


# ---------------------------------------------------------------------------
# PNG (dependency-free writer)
# ---------------------------------------------------------------------------


def save_png(image: np.ndarray, path: str | Path) -> None:
    """Write an (H, W, 3|4) uint8 image as PNG (zlib + struct, no deps)."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    h, w, c = image.shape
    color_type = {3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = b"".join(b"\x00" + image[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)


def save_gif(frames, path: str | Path, *, fps: float = 10.0) -> None:
    """Write a list of (H, W, 3|4) uint8 frames as a looping animated GIF.

    The headless stand-in for the reference's interactive 60 Hz window
    (src/main.rs:52-53, AutoVsync): ``cli animate --gif`` captures the same
    orbit/object motion as a shareable artifact. Uses Pillow (in the base
    image stack); raises a clear error if it is unavailable.
    """
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - Pillow is baked in
        raise RuntimeError(
            "animated GIF export needs Pillow; write PNG frames instead"
        ) from e
    if not frames:
        raise ValueError("save_gif needs at least one frame")
    imgs = []
    for f in frames:
        f = np.asarray(f)
        if f.dtype != np.uint8:
            f = (np.clip(f, 0.0, 1.0) * 255.0).astype(np.uint8)
        imgs.append(Image.fromarray(f[..., :3], "RGB"))
    imgs[0].save(
        Path(path),
        save_all=True,
        append_images=imgs[1:],
        duration=max(int(round(1000.0 / fps)), 20),
        loop=0,
    )


# ---------------------------------------------------------------------------
# Voxel-field checkpoints
# ---------------------------------------------------------------------------


def save_field(field, path: str | Path) -> None:
    """Checkpoint a voxel field between refine levels (deterministic resume)."""
    np.savez_compressed(
        path,
        lowers=field.to_numpy(),
        voxel_size=np.float32(field.voxel_size),
        level=np.int32(field.level),
    )


def load_field(path: str | Path):
    from bsdmg_tpu.mesh.field import VoxelField
    import jax.numpy as jnp

    data = np.load(path)
    lowers = jnp.asarray(data["lowers"], jnp.float32)
    return VoxelField(
        lowers=lowers,
        count=int(lowers.shape[0]),
        voxel_size=float(data["voxel_size"]),
        level=int(data["level"]),
    )

"""Export round-trip tests: OBJ, VTK, PNG, voxel-field checkpoints."""

import numpy as np

from bsdmg_tpu.config import MeshGenConfig
from bsdmg_tpu.mesh import create_voxel_field, generate_mesh, refine_field
from bsdmg_tpu.mesh.export import (
    load_field,
    load_obj,
    save_field,
    save_obj,
    save_png,
    save_vtk,
)
from bsdmg_tpu.models import sphere_scene

SPHERE = sphere_scene(1.0).bind()


def _mesh():
    cfg = MeshGenConfig(init_factor=8, bb_size=4.0)
    return generate_mesh(SPHERE, refine_steps=1, config=cfg)


class TestObj:
    def test_round_trip(self, tmp_path):
        mesh = _mesh()
        path = tmp_path / "m.obj"
        save_obj(mesh, path)
        loaded = load_obj(path)
        assert loaded.vertex_count == mesh.vertex_count
        assert loaded.triangle_count == mesh.triangle_count
        np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-5)
        np.testing.assert_allclose(loaded.normals, mesh.normals, atol=1e-5)
        np.testing.assert_array_equal(loaded.faces, mesh.faces)

    def test_quad_fan_triangulation(self, tmp_path):
        path = tmp_path / "quad.obj"
        path.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
        )
        loaded = load_obj(path)
        assert loaded.triangle_count == 2
        np.testing.assert_array_equal(loaded.faces, [[0, 1, 2], [0, 2, 3]])


class TestVtk:
    def test_header_and_counts(self, tmp_path):
        mesh = _mesh()
        path = tmp_path / "m.vtk"
        save_vtk(mesh, path)
        text = path.read_text().splitlines()
        assert text[0].startswith("# vtk DataFile")
        assert f"POINTS {mesh.vertex_count} float" in text
        assert f"POLYGONS {mesh.triangle_count} {4 * mesh.triangle_count}" in text


class TestPng:
    def test_png_magic_and_size(self, tmp_path):
        img = np.zeros((4, 6, 3), np.uint8)
        img[..., 0] = 255
        path = tmp_path / "x.png"
        save_png(img, path)
        data = path.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # decode IHDR dims
        import struct

        w, h = struct.unpack(">II", data[16:24])
        assert (w, h) == (6, 4)

    def test_float_input(self, tmp_path):
        img = np.random.RandomState(0).uniform(0, 1, (8, 8, 3))
        save_png(img, tmp_path / "f.png")


class TestGif:
    def test_animated_gif_round_trip(self, tmp_path):
        from bsdmg_tpu.mesh.export import save_gif

        frames = [
            np.full((4, 6, 4), v, np.uint8) for v in (0, 128, 255)
        ]
        path = tmp_path / "anim.gif"
        save_gif(frames, path, fps=5.0)
        data = path.read_bytes()
        assert data[:6] in (b"GIF87a", b"GIF89a")
        from PIL import Image

        with Image.open(path) as im:
            assert im.n_frames == 3
            assert im.size == (6, 4)

    def test_empty_raises(self, tmp_path):
        from bsdmg_tpu.mesh.export import save_gif

        import pytest

        with pytest.raises(ValueError):
            save_gif([], tmp_path / "x.gif")


class TestFieldCheckpoint:
    def test_round_trip(self, tmp_path):
        cfg = MeshGenConfig(init_factor=8, bb_size=4.0)
        field = refine_field(SPHERE, create_voxel_field(cfg), cfg)
        path = tmp_path / "field.npz"
        save_field(field, path)
        loaded = load_field(path)
        assert loaded.count == field.count
        assert loaded.voxel_size == field.voxel_size
        assert loaded.level == field.level
        np.testing.assert_allclose(loaded.to_numpy(), field.to_numpy())

"""Native C++ runtime vs NumPy fallback: identical meshes, identical OBJ."""

import numpy as np
import pytest

from bsdmg_tpu.mesh.weld import weld_vertices
from bsdmg_tpu.runtime.native import (
    native_available,
    weld_vertices_native,
    write_obj_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built and g++ unavailable"
)


def _soup(n=5000, shared=500, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-2, 2, (shared, 3)).astype(np.float32)
    tris = base[rng.randint(0, shared, (n, 3))]
    nrm = rng.normal(size=tris.shape).astype(np.float32)
    return tris, nrm


class TestNativeWeld:
    def test_matches_numpy(self):
        tris, nrm = _soup()
        vn, nn, fn = weld_vertices(tris, nrm, use_native=True)
        vp, npn, fp = weld_vertices(tris, nrm, use_native=False)
        np.testing.assert_array_equal(vn, vp)
        np.testing.assert_array_equal(nn, npn)
        np.testing.assert_array_equal(fn, fp)

    def test_empty(self):
        out = weld_vertices_native(
            np.zeros((0, 3, 3), np.float32), np.zeros((0, 3, 3), np.float32)
        )
        assert out is not None
        v, n, f = out
        assert v.shape == (0, 3) and f.shape == (0, 3)

    def test_half_products_round_identically(self):
        """Coordinates whose quantized product lands on an exact .5 (e.g.
        0.078125 * 1e5 = 7812.5, an exact MC midpoint at voxel_size 5/64)
        must key the same under the native llroundf (half-away-from-zero)
        and the NumPy fallback — np.round's half-to-even once diverged here
        and welded different vertex sets."""
        halves = np.asarray(
            [0.078125, -0.078125, 0.156250 + 5e-6, 1.5e-5, -2.5e-5, 0.0],
            np.float32,
        )
        tris = np.stack(
            [np.roll(halves, k)[:3] for k in range(6)] * 2
        ).reshape(-1, 3, 3).astype(np.float32)
        nrm = np.ones_like(tris)
        vn, nn, fn = weld_vertices(tris, nrm, use_native=True)
        vp, npn, fp = weld_vertices(tris, nrm, use_native=False)
        np.testing.assert_array_equal(vn, vp)
        np.testing.assert_array_equal(fn, fp)

    def test_quantization_merges(self):
        tri = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        soup = np.stack([tri, tri + 1e-7])
        nrm = np.zeros_like(soup)
        v, n, f = weld_vertices_native(soup, nrm)
        assert v.shape == (3, 3)
        np.testing.assert_array_equal(f[0], f[1])


class TestNativeObj:
    def test_same_bytes_as_python_writer(self, tmp_path):
        from bsdmg_tpu.mesh.export import save_obj
        from bsdmg_tpu.mesh.pipeline import Mesh

        tris, nrm = _soup(n=200, shared=80)
        v, n, f = weld_vertices(tris, nrm)
        mesh = Mesh(vertices=v, normals=n, faces=f)

        p_native = tmp_path / "n.obj"
        p_python = tmp_path / "p.obj"
        assert write_obj_native(p_native, v, n, f)
        save_obj(mesh, p_python, use_native=False)

        native_lines = p_native.read_text().splitlines()
        python_lines = p_python.read_text().splitlines()
        # identical payload (comment headers differ)
        assert native_lines[1:] == python_lines[1:]


def test_native_obj_reader_matches_python(tmp_path):
    from bsdmg_tpu.mesh.export import load_obj
    from bsdmg_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")

    # mixed face formats, a quad fan, negative indices, comments
    obj = tmp_path / "mixed.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1 2 3 4\n"          # quad -> 2 triangles
        "f 1//1 2//2 5//5\n"   # v//vn form
        "f -5/-5/-5 -4/-4/-4 -1/-1/-1\n"  # negative indices
        "usemtl whatever\n"
    )
    a = load_obj(obj, use_native=True)
    b = load_obj(obj, use_native=False)
    np.testing.assert_allclose(a.vertices, b.vertices)
    np.testing.assert_allclose(a.normals, b.normals)
    np.testing.assert_array_equal(a.faces, b.faces)
    assert a.triangle_count == 4


def test_native_obj_reader_long_face_line(tmp_path):
    """A multi-KB polygon fan (legal OBJ from CAD exporters) must parse
    identically to the Python reader — a fixed line buffer would split it."""
    from bsdmg_tpu.mesh.export import load_obj
    from bsdmg_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")

    n = 1500  # one face row with 1500 indices (~10KB line)
    rng = np.random.default_rng(0)
    lines = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in rng.normal(size=(n, 3))]
    lines.append("f " + " ".join(str(i + 1) for i in range(n)))
    obj = tmp_path / "fan.obj"
    obj.write_text("\n".join(lines) + "\n")

    a = load_obj(obj, use_native=True)
    b = load_obj(obj, use_native=False)
    assert a.triangle_count == n - 2
    np.testing.assert_allclose(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.faces, b.faces)

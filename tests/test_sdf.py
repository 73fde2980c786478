"""Unit tests for the SDF primitive library against closed-form values."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from bsdmg_tpu import sdf
from bsdmg_tpu.models import reference_object, reference_render_scene


def P(*coords):
    return jnp.asarray(coords, jnp.float32).reshape(-1, 3)


class TestPrimitives:
    def test_sphere(self):
        p = P(2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 3.0, 4.0)
        np.testing.assert_allclose(
            sdf.sd_sphere(p, 0.0, 1.0), [1.0, -1.0, 4.0], atol=1e-6
        )

    def test_unit_sphere_diameter_one(self):
        # reference sd_unit_sphere is length(p) - 0.5 (radius 1/2)
        np.testing.assert_allclose(sdf.sd_unit_sphere(P(1.0, 0.0, 0.0)), [0.5], atol=1e-6)

    def test_box_exact(self):
        size = jnp.asarray([2.0, 4.0, 6.0])
        # on-face, outside-face, corner, center
        p = P(1.0, 0.0, 0.0, 2.0, 0.0, 0.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0)
        d = sdf.sd_box(p, 0.0, size)
        corner = np.sqrt(1.0 + 1.0 + 1.0)
        np.testing.assert_allclose(d, [0.0, 1.0, corner, -1.0], atol=1e-6)

    def test_line_segment(self):
        a, b = [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]
        p = P(0.5, 1.0, 0.0, 2.0, 0.0, 0.0, -1.0, 0.0, 0.0)
        np.testing.assert_allclose(sdf.sd_line(p, a, b), [1.0, 1.0, 1.0], atol=1e-6)

    def test_ray_infinite_vs_segment(self):
        origin, direction = [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]
        p = P(-3.0, 4.0, 0.0)
        # infinite line: distance is just |y| = 4; segment of len 1: corner dist
        np.testing.assert_allclose(sdf.sd_ray(p, origin, direction), [4.0], atol=1e-6)
        np.testing.assert_allclose(
            sdf.sd_ray_segment(p, origin, direction, 1.0), [5.0], atol=1e-6
        )

    def test_smooth_min_limits(self):
        a = jnp.asarray([0.0, 5.0, -1.0])
        b = jnp.asarray([10.0, 5.0, 3.0])
        k = 0.5
        out = sdf.smooth_min(a, b, k)
        # far apart -> plain min; equal -> min - k/6
        assert np.isclose(out[0], 0.0)
        assert np.isclose(out[1], 5.0 - k / 6.0)
        assert np.isclose(out[2], -1.0)
        # always <= min(a, b)
        assert np.all(np.asarray(out) <= np.minimum(a, b) + 1e-7)

    def test_wrap(self):
        p = P(2.6, -3.0, 0.0)
        w = sdf.wrap(p, jnp.full(3, -2.5), jnp.full(3, 2.5))
        np.testing.assert_allclose(w[0], [-2.4, 2.0, 0.0], atol=1e-6)

    def test_bounding_box(self):
        d = sdf.sd_bounding_box(P(0.0, 0.0, 0.0, 3.0, 0.0, 0.0), -1.0, 1.0)
        np.testing.assert_allclose(d, [-1.0, 2.0], atol=1e-6)

    def test_simple_box_interior(self):
        d = sdf.sd_simple_box(P(0.0, 0.0, 0.0), 0.0, jnp.asarray([2.0, 2.0, 2.0]))
        np.testing.assert_allclose(d, [-1.0], atol=1e-6)


class TestBoxSkeleton:
    def test_cube_skeleton_compat_equals_fixed(self):
        # for a cube the reference index bug is invisible
        p = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 2.0
        a = sdf.sd_box_skeleton(p, 0.0, jnp.full(3, 2.0), 0.1, reference_compat=True)
        b = sdf.sd_box_skeleton(p, 0.0, jnp.full(3, 2.0), 0.1, reference_compat=False)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_fixed_skeleton_edge_distance(self):
        # midpoint of the +y+z edge along x of a (3,1,0.5) box, lw=0
        size = jnp.asarray([3.0, 1.0, 0.5])
        p = P(0.0, 0.5, 0.25)
        d = sdf.sd_box_skeleton(p, 0.0, size, 0.0, reference_compat=False)
        np.testing.assert_allclose(d, [0.0], atol=1e-6)

    def test_compat_differs_for_noncubic(self):
        size = jnp.asarray([3.0, 1.0, 0.5])
        p = jax.random.normal(jax.random.PRNGKey(1), (128, 3)) * 2.0
        a = sdf.sd_box_skeleton(p, 0.0, size, 0.1, reference_compat=True)
        b = sdf.sd_box_skeleton(p, 0.0, size, 0.1, reference_compat=False)
        assert not np.allclose(a, b)


class TestMandelbulb:
    def test_outside_positive(self):
        p = P(3.0, 0.0, 0.0)
        assert float(sdf.sd_mandelbulb(p)[0]) > 0.0

    def test_batched_matches_single(self):
        pts = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
        batched = sdf.sd_mandelbulb(pts)
        singles = jnp.stack([sdf.sd_mandelbulb(pts[i : i + 1])[0] for i in range(8)])
        np.testing.assert_allclose(batched[:8], singles, rtol=1e-6)


class TestAabb:
    def test_inside(self):
        inside = sdf.inside_aabb(P(0.0, 0.0, 0.0, 3.0, 0.0, 0.0), -1.0, 1.0)
        np.testing.assert_array_equal(inside, [True, False])

    def test_ray_distance(self):
        o = P(-5.0, 0.0, 0.0)
        d = P(1.0, 0.0, 0.0)
        dist = sdf.ray_distance_to_bb(o, d, jnp.full(3, -1.0), jnp.full(3, 1.0))
        np.testing.assert_allclose(dist, [4.0], atol=1e-6)

    def test_ray_miss(self):
        o = P(-5.0, 3.0, 0.0)
        d = P(1.0, 0.0, 0.0)
        dist = sdf.ray_distance_to_bb(o, d, jnp.full(3, -1.0), jnp.full(3, 1.0))
        assert float(dist[0]) > 1e30

    def test_ray_inside_is_zero(self):
        o = P(0.0, 0.0, 0.0)
        d = P(1.0, 0.0, 0.0)
        dist = sdf.ray_distance_to_bb(o, d, jnp.full(3, -1.0), jnp.full(3, 1.0))
        np.testing.assert_allclose(dist, [0.0], atol=1e-6)


class TestNormals:
    def test_grad_vs_fd_on_sphere(self):
        scene = lambda p: sdf.sd_sphere(p, 0.0, 1.0)
        p = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True) * 1.5
        ng = sdf.normal_grad(scene, p)
        nf = sdf.normal_fd4(scene, p)
        np.testing.assert_allclose(ng, nf, atol=5e-4)
        # sphere normal is radial
        np.testing.assert_allclose(ng, np.asarray(p) / 1.5, atol=5e-4)

    def test_normal_plane_orthogonal(self):
        scene = lambda p: sdf.sd_sphere(p, 0.0, 1.0)
        p = P(1.5, 0.2, 0.3)
        up, forward, right = sdf.normal_plane(scene, p)
        assert abs(float(jnp.sum(up * right, axis=-1)[0])) < 1e-4
        assert abs(float(jnp.sum(up * forward, axis=-1)[0])) < 1e-4

    def test_closest_surface_point(self):
        scene = reference_object().bind()
        p = jax.random.normal(jax.random.PRNGKey(4), (64, 3)) * 1.5
        g = sdf.closest_surface_point(scene, p, iters=32, tolerance=1e-5)
        assert float(jnp.max(jnp.abs(scene(g)))) < 1e-4


class TestReferenceScene:
    def test_object_symmetry(self):
        scene = reference_object().bind()
        p = P(0.3, 0.4, 0.1)
        np.testing.assert_allclose(scene(p), scene(-p), atol=1e-6)

    def test_origin_inside(self):
        scene = reference_object().bind()
        assert float(scene(P(0.0, 0.0, 0.0))[0]) < 0.0

    def test_far_outside_positive(self):
        scene = reference_object().bind()
        assert float(scene(P(10.0, 10.0, 10.0))[0]) > 0.0

    def test_render_scene_includes_bb_frame(self):
        obj = reference_object().bind()
        full = reference_render_scene().bind()
        # a point on the bb frame edge: corner of the [-2.5, 2.5] cube
        p = P(2.5, 2.5, 2.5)
        assert float(full(p)[0]) < float(obj(p)[0])
        np.testing.assert_allclose(full(p), [-0.05], atol=1e-5)

    def test_grad_wrt_params(self):
        scene = reference_object()
        p = P(1.3, 0.2, 0.1)

        def loss(params):
            return jnp.sum(scene.sdf(params, p))

        g = jax.grad(loss)(scene.params)
        # moving the sphere radius outward decreases the distance
        assert float(g["sphere_radius"]) < 0.0
        assert np.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()


class TestWrappedObjectScene:
    def test_wrap_periodicity(self):
        """The wrapped scene repeats the reference object with the cell
        period, on both the points API and the component/baked forms."""
        import numpy as np

        from bsdmg_tpu.models import get_scene, reference_object
        from bsdmg_tpu.ops.pallas import compile_scene_csdf

        scene = get_scene("wrapped_object")
        base = reference_object()
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-3.5, 3.5, size=(64, 3)), jnp.float32)
        cell = float(scene.params["cell"])

        d0 = np.asarray(base.bind()(pts))
        w0 = np.asarray(scene.bind()(pts))
        np.testing.assert_allclose(w0, d0, atol=1e-5)

        shift = jnp.asarray([[cell, -2 * cell, cell]], jnp.float32)
        w1 = np.asarray(scene.bind()(pts + shift))
        np.testing.assert_allclose(w1, w0, atol=1e-4)

        # component and baked forms agree with the points form
        c = np.asarray(scene.csdf(scene.params, pts[:, 0], pts[:, 1], pts[:, 2]))
        np.testing.assert_allclose(c, w0, atol=1e-5)
        baked = compile_scene_csdf(scene)
        b = np.asarray(baked(pts[:, 0], pts[:, 1], pts[:, 2]))
        np.testing.assert_allclose(b, w0, atol=1e-5)

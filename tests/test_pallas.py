"""Pallas kernel tests (interpreter mode on CPU) against the pure-JAX oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from bsdmg_tpu.cam import generate_rays, look_at
from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.models import box_scene, reference_render_scene, sphere_scene
from bsdmg_tpu.ops.shade import render_image
from bsdmg_tpu.ops.trace import COLLISION, sphere_trace
from bsdmg_tpu.ops.pallas import compile_scene_csdf, sphere_trace_pallas
from bsdmg_tpu.ops.pallas.csdf import scene_bounds
from bsdmg_tpu.ops.pallas.render_kernel import render_image_pallas, trace_pallas


def _rays(scene_cam=(5.0, 2.0, -5.0), w=256, h=64):
    cam = look_at(scene_cam, fov=np.pi / 4)
    return generate_rays(cam, (w, h), (1920.0, 1080.0))


class TestCsdf:
    @pytest.mark.parametrize(
        "scene_fn", [reference_render_scene, lambda: sphere_scene(1.0), lambda: box_scene((2.0, 1.0, 0.5))]
    )
    def test_matches_stacked_sdf(self, scene_fn):
        scene = scene_fn()
        csdf = compile_scene_csdf(scene)
        assert csdf is not None
        rng = np.random.RandomState(0)
        p = rng.uniform(-4, 4, (8, 128, 3)).astype(np.float32)
        ours = np.asarray(csdf(jnp.asarray(p[..., 0]), jnp.asarray(p[..., 1]), jnp.asarray(p[..., 2])))
        ref = np.asarray(scene.bind()(jnp.asarray(p)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_bounds_contain_surface(self):
        scene = reference_render_scene()
        bb = scene_bounds(scene)
        lo, hi = np.asarray(bb[0]), np.asarray(bb[1])
        # sample surface-ish points via the sdf: points with |sd| small
        rng = np.random.RandomState(1)
        p = rng.uniform(-3.5, 3.5, (8192, 3)).astype(np.float32)
        sd = np.asarray(scene.bind()(jnp.asarray(p)))
        # all interior points (sd <= 0) lie inside the bound, and near-surface
        # points lie within their own distance of it
        inside = p[sd <= 0]
        assert len(inside) > 0
        assert (inside >= lo - 1e-5).all() and (inside <= hi + 1e-5).all()
        near = p[np.abs(sd) < 0.05]
        assert (near >= lo - 0.05 - 1e-5).all() and (near <= hi + 0.05 + 1e-5).all()

    def test_unknown_scene_returns_none(self):
        from bsdmg_tpu.models.scenes import Scene

        dummy = Scene("custom", lambda q, p: jnp.zeros(p.shape[:-1]), {})
        assert compile_scene_csdf(dummy) is None


class TestPallasTracer:
    def test_matches_pure_tracer(self):
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        origins, dirs, cone = _rays()
        ref = sphere_trace(scene.bind(), origins, dirs, cone)
        pal = sphere_trace_pallas(csdf, origins, dirs, cone, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.outcome), np.asarray(pal.outcome))
        np.testing.assert_array_equal(np.asarray(ref.steps), np.asarray(pal.steps))
        coll = np.asarray(ref.outcome) == COLLISION
        depth_diff = np.abs(np.asarray(ref.depth) - np.asarray(pal.depth))
        assert depth_diff[coll].max() < 1e-4

    def test_non_tile_aligned_shapes(self):
        scene = sphere_scene(1.0)
        csdf = compile_scene_csdf(scene)
        origins, dirs, cone = _rays(w=100, h=37)  # not multiples of (8, 128)
        ref = sphere_trace(scene.bind(), origins, dirs, cone)
        pal = sphere_trace_pallas(csdf, origins, dirs, cone, interpret=True)
        assert pal.outcome.shape == (37, 100)
        np.testing.assert_array_equal(np.asarray(ref.outcome), np.asarray(pal.outcome))

    # tail_cap=512 is a regression pin: a cap that is a multiple of 128 but
    # not of the 8x128 tile once floor-divided phase B's grid to zero and
    # scattered uninitialized planes onto active rays
    @pytest.mark.parametrize(
        "two_phase,tail_cap",
        [(False, None), (True, None), (True, 1024), (True, 512)],
    )
    def test_trace_pipeline(self, two_phase, tail_cap):
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        origins, dirs, cone = _rays()
        ref = sphere_trace(scene.bind(), origins, dirs, cone)
        depth, steps, outcome = trace_pallas(
            csdf, origins, dirs, cone, bb=bb, two_phase=two_phase,
            tail_cap=tail_cap, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ref.outcome), np.asarray(outcome))
        coll = np.asarray(ref.outcome) == COLLISION
        depth_diff = np.abs(np.asarray(ref.depth) - np.asarray(depth))
        assert depth_diff[coll].max() < 1e-3


class TestPallasRender:
    @pytest.mark.parametrize("two_phase", [False, True, "block"])
    def test_matches_pure_render(self, two_phase):
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        origins, dirs, cone = _rays()
        ref = np.asarray(render_image(scene.bind(), origins, dirs, cone))
        img = np.asarray(
            render_image_pallas(
                csdf, origins, dirs, cone, bb=bb, two_phase=two_phase, interpret=True
            )
        )
        diff = np.abs(img - ref).max(-1)
        assert np.mean(diff < 2e-2) == 1.0
        assert diff.mean() < 1e-4

    def test_block_retirement_pixel_exact(self):
        """Block-granule ray retirement must be pixel-identical to the
        single-phase fused render (the march is resumable, so phases A+B
        sample the same point sequence), including when the static block
        cap overflows and the phase-C fallback finishes the leftovers."""
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        origins, dirs, cone = _rays()
        base = np.asarray(
            render_image_pallas(csdf, origins, dirs, cone, bb=bb, interpret=True)
        )
        blk = np.asarray(
            render_image_pallas(
                csdf, origins, dirs, cone, bb=bb, two_phase="block",
                phase_a_steps=24, interpret=True,
            )
        )
        np.testing.assert_array_equal(blk, base)
        # tiny cap -> phase C must finish the overflow blocks exactly
        tiny = np.asarray(
            render_image_pallas(
                csdf, origins, dirs, cone, bb=bb, two_phase="block",
                phase_a_steps=8, tail_cap=4, interpret=True,
            )
        )
        np.testing.assert_array_equal(tiny, base)
        # ragged caps are normalized to the phase-B grid granule (a cap not
        # a multiple of 4 once left whole gathered blocks unwritten and
        # scattered uninitialized rows into the frame)
        for cap in (2, 5):
            ragged = np.asarray(
                render_image_pallas(
                    csdf, origins, dirs, cone, bb=bb, two_phase="block",
                    phase_a_steps=8, tail_cap=cap, interpret=True,
                )
            )
            np.testing.assert_array_equal(ragged, base)
        # taller phase-A blocks (the sweepable ILP knob) change only the
        # grid decomposition, never a pixel
        for rows in (16, 64, 128):
            tall = np.asarray(
                render_image_pallas(
                    csdf, origins, dirs, cone, bb=bb, two_phase="block",
                    phase_a_steps=24, phase_a_rows=rows, interpret=True,
                )
            )
            np.testing.assert_array_equal(tall, base)
        # invalid heights are a loud error, not a silent fallback (a bench
        # sweep must know the knob applied): non-divisor, sub-tile, zero
        for rows in (96, 4, 0):
            with pytest.raises(ValueError, match="phase_a_rows"):
                render_image_pallas(
                    csdf, origins, dirs, cone, bb=bb, two_phase="block",
                    phase_a_steps=24, phase_a_rows=rows, interpret=True,
                )

    def test_bb_skip_safety(self):
        """BB-skip must never change any pixel vs no-skip."""
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        # wide fov so plenty of rays miss the bb
        cam = look_at((6.0, 3.0, -6.0), fov=np.pi / 2.5)
        origins, dirs, cone = generate_rays(cam, (256, 64), (1920.0, 1080.0))
        a = np.asarray(
            render_image_pallas(csdf, origins, dirs, cone, bb=bb, use_bb_skip=True, interpret=True)
        )
        b = np.asarray(
            render_image_pallas(csdf, origins, dirs, cone, bb=bb, use_bb_skip=False, interpret=True)
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestOverRelaxation:
    def test_relaxed_march_matches_exact(self):
        """omega > 1 (Keinert safe over-relaxation) must land on the same
        surface as the classic march within collision tolerance."""
        scene = reference_render_scene()
        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        origins, dirs, cone = _rays(w=128, h=32)
        d0, s0, o0 = trace_pallas(
            csdf, origins, dirs, cone, bb=bb, two_phase=False, interpret=True
        )
        d1, s1, o1 = trace_pallas(
            csdf, origins, dirs, cone, bb=bb, two_phase=False, interpret=True,
            omega=1.5,
        )
        assert (np.asarray(o0) == np.asarray(o1)).mean() > 0.995
        both_hit = (np.asarray(o0) == COLLISION) & (np.asarray(o1) == COLLISION)
        assert both_hit.any()
        np.testing.assert_allclose(
            np.asarray(d1)[both_hit], np.asarray(d0)[both_hit], atol=5e-3
        )

    def test_config_relaxation_is_honored(self):
        """MarchConfig.relaxation routes into the kernel when omega is None."""
        scene = sphere_scene(1.0)
        csdf = compile_scene_csdf(scene)
        origins, dirs, cone = _rays(w=128, h=16)
        cfg = MarchConfig(relaxation=1.4)
        d, s, o = trace_pallas(
            csdf, origins, dirs, cone, cfg, two_phase=False, interpret=True
        )
        d0, s0, o0 = trace_pallas(
            csdf, origins, dirs, cone, two_phase=False, interpret=True
        )
        hit = (np.asarray(o) == COLLISION) & (np.asarray(o0) == COLLISION)
        assert hit.any()
        np.testing.assert_allclose(np.asarray(d)[hit], np.asarray(d0)[hit], atol=5e-3)
        # the relaxed path actually ran: step sequences differ somewhere
        assert (np.asarray(s) != np.asarray(s0)).any()


def test_mandelbulb_csdf_matches_scene():
    from bsdmg_tpu.models import mandelbulb_scene
    from bsdmg_tpu.ops.pallas import compile_scene_csdf
    from bsdmg_tpu.ops.pallas.csdf import scene_bounds

    scene = mandelbulb_scene()
    csdf = compile_scene_csdf(scene)
    assert csdf is not None
    rng = np.random.RandomState(3)
    p = rng.uniform(-1.5, 1.5, (8, 128, 3)).astype(np.float32)
    ours = np.asarray(csdf(jnp.asarray(p[..., 0]), jnp.asarray(p[..., 1]), jnp.asarray(p[..., 2])))
    ref = np.asarray(scene.bind()(jnp.asarray(p)))
    # the fractal iteration amplifies float reassociation between the stacked
    # and component forms near the escape boundary; 5e-4 is float32-equivalent
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    # param-traced component twin agrees too
    twin = np.asarray(scene.csdf(scene.params, jnp.asarray(p[..., 0]), jnp.asarray(p[..., 1]), jnp.asarray(p[..., 2])))
    np.testing.assert_allclose(twin, ref, atol=1e-3)
    # bounds contain the surface
    bb = scene_bounds(scene)
    assert bb is not None
    sd = ref
    inside = p[sd <= 0]
    if len(inside):
        assert (inside >= np.asarray(bb[0]) - 1e-5).all()
        assert (inside <= np.asarray(bb[1]) + 1e-5).all()


def test_csdf_parity_over_random_params():
    """Both component forms (baked compiler + param-traced twin) must match
    the points API for NON-default parameters — catches bugs that the
    default-param goldens cannot see (e.g. factorization assumptions)."""
    from bsdmg_tpu.models.scenes import Scene, _sd_obj, _sd_obj_c, default_object_params
    from bsdmg_tpu.ops.pallas.csdf import reference_object_csdf

    rng = np.random.RandomState(11)
    pts = rng.uniform(-4, 4, (2048, 3)).astype(np.float32)
    x, y, z = (jnp.asarray(pts[:, a]) for a in range(3))

    for trial in range(5):
        params = default_object_params()
        params = dict(
            params,
            skeleton_center=jnp.asarray(rng.uniform(-1, 1, 3), jnp.float32),
            skeleton_size=jnp.asarray(rng.uniform(0.3, 3.5, 3), jnp.float32),
            skeleton_line_width=jnp.float32(rng.uniform(0.02, 0.3)),
            sphere_radius=jnp.float32(rng.uniform(0.3, 2.0)),
            smooth_k=jnp.float32(rng.uniform(0.1, 1.0)),
        )
        ref = np.asarray(_sd_obj(params, jnp.asarray(pts)))
        twin = np.asarray(_sd_obj_c(params, x, y, z))
        np.testing.assert_allclose(twin, ref, atol=2e-5, err_msg=f"twin trial {trial}")
        baked = reference_object_csdf(params)
        got = np.asarray(baked(x, y, z))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"baked trial {trial}")


def test_split_specialization_matches_unsplit():
    """Per-tile scene specialization (compile_scene_split) must not change
    the image: far-only tiles trace the exact far-scene and near rays are
    conservatively classified (interpret mode)."""
    from bsdmg_tpu.ops.pallas.csdf import compile_scene_split

    scene = reference_render_scene()
    csdf = compile_scene_csdf(scene)
    bb = scene_bounds(scene)
    split = compile_scene_split(scene)
    assert split is not None
    cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
    origins, dirs, cone = generate_rays(cam, (256, 64), (1920.0, 1080.0))

    from bsdmg_tpu.ops.pallas.render_kernel import render_image_pallas

    a = np.asarray(
        render_image_pallas(csdf, origins, dirs, cone, bb=bb, interpret=True)
    )
    b = np.asarray(
        render_image_pallas(
            csdf, origins, dirs, cone, bb=bb, split=split, interpret=True
        )
    )
    diff = np.abs(a - b).max(-1)
    # step-count paths may differ on boundary pixels; colors must agree
    assert (diff > 1e-3).mean() < 1e-3
    assert diff.mean() < 1e-5

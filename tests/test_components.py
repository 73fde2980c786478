"""Tests for parity components: sampling, motion, session, containers, debug.

Reference behaviors being matched are cited per test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsdmg_tpu.cam import (
    cubic_interpolate,
    fetch_2d,
    index_2d,
    ndc_to_interpolated_value,
)
from bsdmg_tpu.mesh import MeshGenSession, Stage
from bsdmg_tpu.models import (
    AxisCyclicMotion,
    RotateAxisMotion,
    SphericCyclicMotion,
    Transform,
    apply_motion,
    set_center,
    sphere_scene,
)
from bsdmg_tpu.utils import (
    BitSet,
    BoundedArray,
    assert_finite,
    checked_sdf,
    vec_maximum,
    vec_minimum,
)


# ---------------------------------------------------------------------------
# sampling (cuda/modules/common.cu:23-66)
# ---------------------------------------------------------------------------


def test_index_2d_clamps():
    # common.cu:33-35: clamp-to-edge then x + y*W
    size = (4, 3)
    assert int(index_2d(jnp.array([2, 1]), size)) == 2 + 1 * 4
    assert int(index_2d(jnp.array([-5, 1]), size)) == 0 + 1 * 4
    assert int(index_2d(jnp.array([9, 9]), size)) == 3 + 2 * 4


def test_fetch_2d_flat_and_2d_agree():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 4)).astype(np.float32)  # (H, W)
    flat = jnp.asarray(img.reshape(-1))
    pts = jnp.asarray([[0, 0], [3, 2], [-1, 5], [2, 1]])
    a = fetch_2d(pts, flat, size=(4, 3))
    b = fetch_2d(pts, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_cubic_interpolate_endpoints_and_linearity():
    # Catmull-Rom passes through y1 at t=0 and y2 at t=1 (common.cu:38-44)
    y = (1.0, 2.0, 5.0, 3.0)
    assert float(cubic_interpolate(*y, 0.0)) == pytest.approx(2.0)
    assert float(cubic_interpolate(*y, 1.0)) == pytest.approx(5.0)
    # exact on linear ramps
    assert float(cubic_interpolate(0.0, 1.0, 2.0, 3.0, 0.25)) == pytest.approx(1.25)


def test_bicubic_reproduces_linear_image():
    # a linear gradient image must be reproduced exactly away from borders
    h, w = 8, 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray(2.0 * xx + 3.0 * yy)
    # NDC of texel centers: (i + 0.5) / size
    pts = jnp.asarray(
        [[(x + 0.5) / w, (y + 0.5) / h] for y in range(2, 6) for x in range(2, 14)]
    )
    out = ndc_to_interpolated_value(pts, img)
    expected = np.asarray([2.0 * x + 3.0 * y for y in range(2, 6) for x in range(2, 14)])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# motion (src/example_scene.rs:63-160)
# ---------------------------------------------------------------------------


def test_axis_cyclic_motion_matches_formula():
    m = AxisCyclicMotion(center=(1.0, 2.0, 3.0), direction=(0.0, 1.0, 0.0), cycle_duration=4.0)
    t = 1.0  # sin(2*pi*1/4) = 1
    out = np.asarray(m.translation_at(t))
    np.testing.assert_allclose(out, [1.0, 3.0, 3.0], atol=1e-6)


def test_spheric_cyclic_motion_matches_formula():
    m = SphericCyclicMotion(
        center=(0.0, 0.0, 0.0), distances=(1.0, 2.0, 3.0), cycle_durations=(4.0, 8.0, 2.0)
    )
    t = 1.0
    expect = np.array(
        [np.sin(2 * np.pi / 4), 2 * np.sin(2 * np.pi / 8), 3 * np.sin(2 * np.pi / 2)]
    )
    np.testing.assert_allclose(np.asarray(m.translation_at(t)), expect, atol=1e-6)


def test_rotate_axis_motion_quaternion():
    m = RotateAxisMotion(axis=(0.0, 0.0, 1.0), cycle_duration=2.0)
    q = np.asarray(m.rotation_at(0.5))  # quarter turn: angle pi/2
    np.testing.assert_allclose(q, [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-6)


def test_set_center_captures_initial_translation():
    # src/example_scene.rs:103-118: center filled once from the transform
    m = AxisCyclicMotion()
    assert m.center is None
    trn = Transform.from_translation((5.0, 6.0, 7.0))
    m2 = set_center(m, trn)
    assert m2.center == (5.0, 6.0, 7.0)
    # already-set centers are untouched
    m3 = set_center(m2, Transform.from_translation((0.0, 0.0, 0.0)))
    assert m3.center == (5.0, 6.0, 7.0)


def test_apply_motion_precedence_and_gate():
    # axis-cyclic beats spheric-cyclic (rs:129-141); gate disables everything
    trn = Transform.from_translation((9.0, 9.0, 9.0))
    ax = AxisCyclicMotion(center=(0.0, 0.0, 0.0), direction=(1.0, 0.0, 0.0), cycle_duration=4.0)
    sp = SphericCyclicMotion(center=(100.0, 0.0, 0.0))
    out = apply_motion(trn, 1.0, axis_cyclic=ax, spheric_cyclic=sp)
    np.testing.assert_allclose(np.asarray(out.translation), [1.0, 0.0, 0.0], atol=1e-6)
    frozen = apply_motion(trn, 1.0, axis_cyclic=ax, enable_movement=False)
    np.testing.assert_allclose(np.asarray(frozen.translation), [9.0, 9.0, 9.0])


def test_apply_motion_is_jittable():
    ax = AxisCyclicMotion(center=(0.0, 0.0, 0.0))
    f = jax.jit(lambda t: apply_motion(Transform.identity(), t, axis_cyclic=ax).translation)
    ts = f(jnp.float32(1.25))
    assert np.isfinite(np.asarray(ts)).all()


def test_motion_params_matches_formula():
    """The animate verb's frame-t params follow the reference motion formula
    (src/example_scene.rs:129-150) through ``motion_params``."""
    from bsdmg_tpu.models import reference_object
    from bsdmg_tpu.models.motion import motion_params

    scene = reference_object()
    ax = AxisCyclicMotion(center=(0.0, 0.0, 0.0), direction=(0.0, 1.0, 0.0), cycle_duration=4.0)
    rot = RotateAxisMotion(axis=(0.0, 0.0, 1.0), cycle_duration=2.0)
    t = 1.0
    p = motion_params(scene.params, t, axis_cyclic=ax, rotate_axis=rot)
    np.testing.assert_allclose(
        np.asarray(p["object_center"]), [0.0, np.sin(2 * np.pi / 4), 0.0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p["object_rotation"]),
        [np.cos(np.pi / 2), 0.0, 0.0, np.sin(np.pi / 2)],
        atol=1e-6,
    )
    # the gate freezes the object exactly like ExampleSceneSettings
    frozen = motion_params(scene.params, t, axis_cyclic=ax, enable_movement=False)
    np.testing.assert_allclose(np.asarray(frozen["object_center"]), [0.0, 0.0, 0.0])


def test_object_transform_moves_the_sdf():
    """object_center / object_rotation rigidly transform the object: the
    moved SDF equals the base SDF at inverse-transformed points, on both the
    points API and the component (SoA) form."""
    from bsdmg_tpu.models import reference_object

    scene = reference_object()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, size=(64, 3)), jnp.float32)

    base = scene.bind()(pts)

    # pure translation
    shift = jnp.asarray([0.4, -0.2, 0.7], jnp.float32)
    p_t = dict(scene.params)
    p_t["object_center"] = shift
    moved = scene.sdf(p_t, pts + shift)
    np.testing.assert_allclose(np.asarray(moved), np.asarray(base), atol=1e-5)

    # quarter turn about +Z: world point R(p) must see the base distance
    angle = np.pi / 2
    quat = jnp.asarray([np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2)], jnp.float32)
    p_r = dict(scene.params)
    p_r["object_rotation"] = quat
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    world = jnp.asarray(np.asarray(pts) @ rot.T)
    moved_r = scene.sdf(p_r, world)
    np.testing.assert_allclose(np.asarray(moved_r), np.asarray(base), atol=1e-5)

    # component form agrees with the points form under the same transform
    moved_c = scene.csdf(p_r, world[:, 0], world[:, 1], world[:, 2])
    np.testing.assert_allclose(np.asarray(moved_c), np.asarray(moved_r), atol=1e-6)


# ---------------------------------------------------------------------------
# session state machine (src/renderer/mod.rs:42-46,155-226)
# ---------------------------------------------------------------------------


def test_session_stage_machine(tmp_path):
    from bsdmg_tpu.config import MeshGenConfig

    scene = sphere_scene()
    out = tmp_path / "mesh.obj"
    s = MeshGenSession(
        scene.bind(),
        MeshGenConfig(init_factor=8),
        output_path=str(out),
        show_preview=True,
    )
    assert s.stage is Stage.EMPTY
    s.refine()  # no-op with warning outside VOXEL_FIELD (rs:182-186)
    assert s.stage is Stage.EMPTY and s.field is None

    s.advance()  # EMPTY -> VOXEL_FIELD (rs:213-221)
    assert s.stage is Stage.VOXEL_FIELD
    assert s.field is not None and s.field.count == 8**3
    assert s.preview is not None and s.preview.triangle_count > 0

    n0 = s.field.count
    size0 = s.field.voxel_size
    s.refine()  # rs:166-181
    assert s.field.voxel_size == pytest.approx(size0 / 2)
    assert s.field.count > 0

    s.advance()  # VOXEL_FIELD -> MESH (rs:196-201)
    assert s.stage is Stage.MESH
    assert s.mesh is not None and s.mesh.triangle_count > 0

    s.advance()  # MESH -> save + reset (rs:203-211)
    assert s.stage is Stage.EMPTY
    assert out.exists() and out.stat().st_size > 0
    assert s.field is None and s.mesh is None


# ---------------------------------------------------------------------------
# containers (cuda/includes/utils.cu:16-78)
# ---------------------------------------------------------------------------


def test_vec_reductions():
    v = jnp.asarray([[1.0, -2.0, 3.0], [0.5, 0.25, 0.125]])
    np.testing.assert_allclose(np.asarray(vec_minimum(v)), [-2.0, 0.125])
    np.testing.assert_allclose(np.asarray(vec_maximum(v)), [3.0, 0.5])


def test_bitset_roundtrip_and_count():
    rng = np.random.default_rng(1)
    mask = rng.random(100) < 0.3
    bs = BitSet.from_mask(jnp.asarray(mask))
    assert int(bs.count()) == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(bs.to_mask(100)), mask)
    # set/get single bits
    bs2 = BitSet.zeros(64).set(5).set(63)
    assert bool(bs2.get(5)) and bool(bs2.get(63)) and not bool(bs2.get(6))
    assert int(bs2.count()) == 2
    bs3 = bs2.set(5, False)
    assert not bool(bs3.get(5)) and int(bs3.count()) == 1


def test_bounded_array_push_and_overflow():
    ba = BoundedArray.empty(3, dtype=jnp.float32)
    for v in (1.0, 2.0, 3.0, 4.0):  # 4th push drops (capacity 3)
        ba = ba.push(jnp.float32(v))
    assert int(ba.count) == 3
    np.testing.assert_allclose(np.asarray(ba.data), [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(ba.live_mask()), [True, True, True])


def test_bounded_array_jittable():
    @jax.jit
    def fill(n):
        ba = BoundedArray.empty(8, dtype=jnp.float32)
        def body(i, b):
            return b.push(i.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, ba)

    out = fill(5)
    assert int(out.count) == 5
    np.testing.assert_allclose(np.asarray(out.data[:5]), np.arange(5, dtype=np.float32))


# ---------------------------------------------------------------------------
# debug (SURVEY §5 sanitizer analogue)
# ---------------------------------------------------------------------------


def test_checked_sdf_flags_nonfinite():
    good = checked_sdf(lambda p: jnp.linalg.norm(p, axis=-1) - 1.0)
    err, d = good(jnp.ones((4, 3)))
    err.throw()  # no error

    bad = checked_sdf(lambda p: p[..., 0] / 0.0, name="bad")
    err, _ = bad(jnp.ones((4, 3)))
    with pytest.raises(Exception):
        err.throw()


def test_assert_finite():
    assert_finite(jnp.ones(4))
    with pytest.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0, np.inf]))


def test_debug_mode_traps_nans():
    from bsdmg_tpu.utils import debug_mode

    with debug_mode():
        jnp.ones(4) + 1.0  # benign op is fine
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0)(jnp.zeros(4)).block_until_ready()
    # restored afterwards: no trap
    jax.jit(lambda x: x / 0.0)(jnp.zeros(4)).block_until_ready()

"""SDF from a triangle-mesh asset (the reference ships OBJ models under
assets/models/ loadable via bevy_obj, src/main.rs:65 — present but unused by
any code path; here mesh scenes are first-class).

TPU-native design: a one-time **grid bake** — exact point-to-triangle
distances combined with generalized winding numbers (Jacobson et al. 2013;
robust inside/outside for watertight and near-watertight meshes) evaluated
for all grid nodes in chunked, fully batched JAX (the distance reduction is
a (points x triangles) sweep that XLA pipelines well) — then the runtime SDF
is a differentiable trilinear interpolation of the baked grid. Rendering,
refinement and marching cubes all consume the interpolated SDF like any
analytic scene.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# exact point-triangle distance (Eberly's region decomposition, batched)
# ---------------------------------------------------------------------------


def _point_triangle_dist_sq(p, a, ab, ac):
    """Squared distance from points ``p (P, 1, 3)`` to triangles given by
    vertex ``a (T, 3)`` and edges ``ab, ac (T, 3)``. Returns ``(P, T)``."""
    ap = p - a  # (P, T, 3)
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    a00 = jnp.sum(ab * ab, axis=-1)
    a01 = jnp.sum(ab * ac, axis=-1)
    a11 = jnp.sum(ac * ac, axis=-1)

    det = jnp.maximum(a00 * a11 - a01 * a01, 1e-20)
    # unconstrained barycentric minimizer
    s = (a11 * d1 - a01 * d2) / det
    t = (a00 * d2 - a01 * d1) / det

    # clamp into the triangle: project onto the three edges and take the best
    def clamped_eval(s, t):
        s = jnp.clip(s, 0.0, 1.0)
        t = jnp.clip(t, 0.0, 1.0 - s)
        q = a + s[..., None] * ab + t[..., None] * ac - p
        return jnp.sum(q * q, axis=-1)

    # interior candidate (valid when s,t >= 0 and s+t <= 1)
    d_int = clamped_eval(s, t)

    # edge AB (t = 0): s* = d1 / a00
    s_ab = jnp.clip(d1 / jnp.maximum(a00, 1e-20), 0.0, 1.0)
    d_ab = clamped_eval(s_ab, jnp.zeros_like(s_ab))

    # edge AC (s = 0): t* = d2 / a11
    t_ac = jnp.clip(d2 / jnp.maximum(a11, 1e-20), 0.0, 1.0)
    d_ac = clamped_eval(jnp.zeros_like(t_ac), t_ac)

    # edge BC: parameterize s = 1 - u, t = u
    bc = ac - ab
    bp = ap - ab
    u = jnp.clip(
        jnp.sum(bc * bp, axis=-1) / jnp.maximum(jnp.sum(bc * bc, axis=-1), 1e-20),
        0.0,
        1.0,
    )
    d_bc = clamped_eval(1.0 - u, u)

    return jnp.minimum(jnp.minimum(d_int, d_ab), jnp.minimum(d_ac, d_bc))


def _winding_number(p, va, vb, vc):
    """Generalized winding number of points ``p (P, 1, 3)`` w.r.t. triangles
    ``va, vb, vc (T, 3)`` (van Oosterom & Strackee solid angles). ~0 outside,
    ~1 inside for watertight meshes."""
    a = va - p  # (P, T, 3)
    b = vb - p
    c = vc - p
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    det = jnp.sum(a * jnp.cross(b, c), axis=-1)
    denom = (
        la * lb * lc
        + jnp.sum(a * b, axis=-1) * lc
        + jnp.sum(b * c, axis=-1) * la
        + jnp.sum(c * a, axis=-1) * lb
    )
    omega = 2.0 * jnp.arctan2(det, denom)  # (P, T)
    return jnp.sum(omega, axis=-1) / (4.0 * np.pi)


@partial(jax.jit, static_argnums=())
def _signed_distance_chunk(points, va, vb, vc):
    p = points[:, None, :]
    ab = vb - va
    ac = vc - va
    d2 = _point_triangle_dist_sq(p, va, ab, ac)
    dist = jnp.sqrt(jnp.min(d2, axis=-1))
    wn = _winding_number(p, va, vb, vc)
    return jnp.where(wn > 0.5, -dist, dist)


def mesh_signed_distance(points, vertices, faces, chunk: int = 8192):
    """Exact signed distance from ``points (N, 3)`` to a triangle mesh,
    evaluated in chunks to bound the (N x T) intermediate."""
    points = jnp.asarray(points, jnp.float32).reshape(-1, 3)
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    va = vertices[faces[:, 0]]
    vb = vertices[faces[:, 1]]
    vc = vertices[faces[:, 2]]

    n = points.shape[0]
    pad = (-n) % chunk
    padded = jnp.concatenate([points, jnp.zeros((pad, 3), jnp.float32)], axis=0)
    chunks = padded.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda c: _signed_distance_chunk(c, va, vb, vc), chunks)
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# baked grid SDF
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SdfGrid:
    """Dense SDF samples on a regular grid over ``[lo, hi]^3`` (hashable by
    identity so scenes built on it can be jit static)."""

    values: jax.Array  # (R, R, R) float32
    lo: tuple  # python floats
    hi: tuple

    @property
    def resolution(self) -> int:
        return self.values.shape[0]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def bake_mesh_grid(
    vertices,
    faces,
    resolution: int = 128,
    padding: float = 0.1,
    chunk: int = 8192,
) -> SdfGrid:
    """Bake a mesh into an ``SdfGrid``. ``padding`` is relative margin around
    the mesh AABB (so the zero level set never touches the grid boundary)."""
    vertices = np.asarray(vertices, np.float32)
    lo = vertices.min(axis=0)
    hi = vertices.max(axis=0)
    extent = float((hi - lo).max())
    center = (lo + hi) / 2.0
    half = extent * (0.5 + padding)
    lo = center - half
    hi = center + half

    axes = [jnp.linspace(lo[a], hi[a], resolution) for a in range(3)]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    values = mesh_signed_distance(grid, vertices, faces, chunk=chunk)
    return SdfGrid(
        values=values.reshape(resolution, resolution, resolution).astype(jnp.float32),
        lo=tuple(map(float, lo)),
        hi=tuple(map(float, hi)),
    )


def _outside_step(interior, outside):
    """Sound sphere-trace step for points OUTSIDE the grid box.

    The surface lies inside the box, so ``dist(p, S) >= outside`` (distance
    to the box) and, by the reverse triangle inequality through the clamp
    point b, ``dist(p, S) >= f(b) - |p - b| = interior - outside``. The old
    ``interior + outside`` was an UPPER bound — triangle-inequality slack
    near box corners let the march overshoot thin features (review finding,
    round 3). ``max`` of the two lower bounds is the tightest sound step."""
    return jnp.where(
        outside > 0.0, jnp.maximum(outside, interior - outside), interior
    )


def grid_sdf(grid: SdfGrid):
    """Differentiable trilinear interpolation SDF ``p (..., 3) -> (...,)``.

    Outside the grid the value falls back to a sound lower bound on the
    surface distance (:func:`_outside_step`), so sphere tracing cannot
    overshoot from outside the box."""
    values = jnp.asarray(grid.values)  # grids may be host-backed (numpy)
    r = grid.resolution
    lo = jnp.asarray(grid.lo, jnp.float32)
    hi = jnp.asarray(grid.hi, jnp.float32)
    scale = (r - 1) / (hi - lo)

    def sdf(p):
        q = (p - lo) * scale
        q_clamped = jnp.clip(q, 0.0, r - 1 - 1e-4)
        i0 = jnp.floor(q_clamped).astype(jnp.int32)
        f = q_clamped - i0
        i1 = jnp.minimum(i0 + 1, r - 1)

        def at(ix, iy, iz):
            return values[ix, iy, iz]

        x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
        x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

        c000 = at(x0, y0, z0)
        c100 = at(x1, y0, z0)
        c010 = at(x0, y1, z0)
        c110 = at(x1, y1, z0)
        c001 = at(x0, y0, z1)
        c101 = at(x1, y0, z1)
        c011 = at(x0, y1, z1)
        c111 = at(x1, y1, z1)

        c00 = c000 + (c100 - c000) * fx
        c10 = c010 + (c110 - c010) * fx
        c01 = c001 + (c101 - c001) * fx
        c11 = c011 + (c111 - c011) * fx
        c0 = c00 + (c10 - c00) * fy
        c1 = c01 + (c11 - c01) * fy
        interior = c0 + (c1 - c0) * fz

        # outside fallback (grad-safe at sq == 0, which is every interior
        # point): see _outside_step for the soundness argument
        box_lo = lo - p
        box_hi = p - hi
        outside_vec = jnp.maximum(jnp.maximum(box_lo, box_hi), 0.0)
        sq = jnp.sum(outside_vec * outside_vec, axis=-1)
        outside = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
        return _outside_step(interior, outside)

    return sdf


def make_grid_interp_csdf(at, r: int, lo, hi):
    """Shared component-form trilinear grid interpolation, parameterized on
    the corner-sample gather ``at(ix, iy, iz)`` — the ONLY thing that
    differs between the XLA path (:func:`grid_csdf`, flat vector gathers)
    and the Pallas kernel (ops/pallas/grid_kernel.py, per-lane ``jnp.take``).
    Single-sources the math so a numeric fix cannot drift between the
    oracle and the hardware path."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    scale = (r - 1) / (hi - lo)

    def csdf(x, y, z):
        qx = (x - float(lo[0])) * float(scale[0])
        qy = (y - float(lo[1])) * float(scale[1])
        qz = (z - float(lo[2])) * float(scale[2])
        cx = jnp.clip(qx, 0.0, r - 1 - 1e-4)
        cy = jnp.clip(qy, 0.0, r - 1 - 1e-4)
        cz = jnp.clip(qz, 0.0, r - 1 - 1e-4)
        x0 = jnp.floor(cx).astype(jnp.int32)
        y0 = jnp.floor(cy).astype(jnp.int32)
        z0 = jnp.floor(cz).astype(jnp.int32)
        fx, fy, fz = cx - x0, cy - y0, cz - z0
        x1 = jnp.minimum(x0 + 1, r - 1)
        y1 = jnp.minimum(y0 + 1, r - 1)
        z1 = jnp.minimum(z0 + 1, r - 1)

        c00 = at(x0, y0, z0) * (1 - fx) + at(x1, y0, z0) * fx
        c10 = at(x0, y1, z0) * (1 - fx) + at(x1, y1, z0) * fx
        c01 = at(x0, y0, z1) * (1 - fx) + at(x1, y0, z1) * fx
        c11 = at(x0, y1, z1) * (1 - fx) + at(x1, y1, z1) * fx
        c0 = c00 + (c10 - c00) * fy
        c1 = c01 + (c11 - c01) * fy
        interior = c0 + (c1 - c0) * fz

        ox = jnp.maximum(jnp.maximum(float(lo[0]) - x, x - float(hi[0])), 0.0)
        oy = jnp.maximum(jnp.maximum(float(lo[1]) - y, y - float(hi[1])), 0.0)
        oz = jnp.maximum(jnp.maximum(float(lo[2]) - z, z - float(hi[2])), 0.0)
        sq = ox * ox + oy * oy + oz * oz
        outside = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
        return _outside_step(interior, outside)

    return csdf


def grid_csdf(grid: SdfGrid):
    """Component-form twin of :func:`grid_sdf`: coordinate planes in,
    distance plane out (full TPU lane occupancy; the 8 corner samples become
    flat gathers). Used by the mesh pipeline's SoA path for mesh-asset
    scenes; not Pallas-compatible (vector gathers from an r^3 table)."""
    r = grid.resolution
    v = grid.values
    # host-backed grids reshape in numpy (free view) — device_put is a pure
    # transfer, while an eager device reshape costs a remote compile here
    flat = jnp.asarray(v.reshape(-1) if isinstance(v, np.ndarray) else v).reshape(-1)

    def at(ix, iy, iz):
        return flat[(ix * r + iy) * r + iz]

    csdf = make_grid_interp_csdf(at, r, grid.lo, grid.hi)
    # a Mosaic kernel cannot capture the R^3 table: consumers (marching
    # cubes' fused/projection kernels) must take their XLA twins instead
    csdf.pallas_compatible = False
    return csdf


def coarsen_grid_lower(grid: SdfGrid, resolution: int = 64) -> SdfGrid:
    """Sound *lower-bound* mip of a fine grid SDF for two-level tracing.

    Each coarse vertex takes the MIN over all fine vertices within max-norm
    radius ``h_c + h_f`` of it. For any point ``p`` in a coarse cell ``C``,
    every fine vertex of ``p``'s fine cell lies within that window of every
    corner of ``C``; the fine trilinear value at ``p`` is a convex
    combination of those fine vertices, hence >= each coarse corner value,
    hence >= the coarse trilinear value. So
    ``trilinear(coarse)(p) <= trilinear(fine)(p)`` everywhere in the box —
    sphere-trace steps on the coarse mip can never overshoot the fine
    surface, with no interpolation-error bound needed (and no lattice
    nesting requirement: the window already covers alignment slop).

    The bound understates by at most ``~sqrt(3) * (h_c + h_f)`` (SDF
    Lipschitz 1), so a coarse march stalls — and hands over to the fine
    grid — roughly one coarse cell before the surface.

    Pooling runs separably on the host (one-time, per bake), and the result
    stays HOST-backed: the mip tables become jit operands downstream, and
    eager device round-trips cost 20-240 s per op on the tunneled backend
    (round-5 measurement).
    """
    v = np.asarray(grid.values)
    r_f = grid.resolution
    r_c = int(resolution)
    lo = np.asarray(grid.lo, np.float64)
    hi = np.asarray(grid.hi, np.float64)
    out = v
    for axis in range(3):
        h_f = (hi[axis] - lo[axis]) / (r_f - 1)
        h_c = (hi[axis] - lo[axis]) / (r_c - 1)
        w = h_c + h_f
        pooled = []
        for j in range(r_c):
            q = j * h_c
            i0 = max(int(np.ceil((q - w) / h_f - 1e-9)), 0)
            i1 = min(int(np.floor((q + w) / h_f + 1e-9)), r_f - 1)
            sl = [slice(None)] * 3
            sl[axis] = slice(i0, i1 + 1)
            pooled.append(out[tuple(sl)].min(axis=axis, keepdims=True))
        out = np.concatenate(pooled, axis=axis)
    return SdfGrid(
        values=np.ascontiguousarray(out, np.float32), lo=grid.lo, hi=grid.hi
    )


def mesh_scene(vertices, faces, resolution: int = 128, name: str = "mesh"):
    """Build a Scene from a triangle mesh (bakes the grid immediately)."""
    from bsdmg_tpu.models.scenes import Scene

    grid = bake_mesh_grid(vertices, faces, resolution=resolution)
    sdf = grid_sdf(grid)
    cfn = grid_csdf(grid)
    return Scene(
        name, lambda params, p: sdf(p), {"grid": grid.values},
        lambda params, x, y, z: cfn(x, y, z),
        grid=grid,
    ), grid

"""Independent NumPy re-implementation of the reference render math.

Used as the golden oracle for the JAX renderer: scalar-style NumPy code,
written directly from the reference semantics (cuda/modules/compute_render.cu,
cuda/includes/ray_marching.cu, cuda/modules/common.cu), sharing no code with
``bsdmg_tpu``.
"""

import numpy as np


def smooth_min(a, b, k):
    h = max(k - abs(a - b), 0.0) / k
    return min(a, b) - h * h * h * k / 6.0


def sd_line(p, b0, b1):
    seg = b1 - b0
    length = np.linalg.norm(seg)
    d = np.clip(np.dot(p - b0, seg / length), 0.0, length)
    return np.linalg.norm(b0 + d * (seg / length) - p)


def sd_box_skeleton(p, bp, bs, lw):
    """Reference semantics incl. the (dir+1)%2 size-index quirk
    (signed_distance.cu:93-113)."""
    bpl = bp - bs / 2.0
    sd = np.inf
    for direction in range(3):
        for c0 in (0, 1):
            for c1 in (0, 1):
                m0 = bpl.copy()
                if c0:
                    m0[(direction + 1) % 3] += bs[(direction + 1) % 2]
                if c1:
                    m0[(direction + 2) % 3] += bs[(direction + 2) % 3]
                m1 = m0.copy()
                m1[direction] += bs[direction]
                sd = min(sd, sd_line(p, m0, m1) - lw)
    return sd


def sd_obj(p):
    a1 = sd_box_skeleton(p, np.zeros(3), np.array([3.0, 1.0, 0.5]), 0.1)
    a2 = np.linalg.norm(p) - 1.0
    return smooth_min(a1, a2, 0.5)


def sd_scene(p, bb_size=5.0):
    sd = sd_obj(p)
    frame = sd_box_skeleton(p, np.zeros(3), np.full(3, bb_size), 0.05)
    return min(sd, frame)


def ray_march(sdf, origin, direction, cone_radius, step_limit=256,
              depth_limit=500.0, collision_eps=1e-3):
    """Reference tracer (ray_marching.cu:14-49). Returns (outcome, pos, depth, steps)
    with outcome 0=Collision 1=StepLimit 2=DepthLimit."""
    pos = origin.copy()
    depth = 0.0
    steps = 0
    while steps < step_limit:
        cd = cone_radius * depth
        d = sdf(pos)
        if d <= cd + collision_eps:
            return 0, pos, depth, steps
        depth += d - cd
        pos = pos + (d - cd) * direction
        if depth > depth_limit:
            return 2, pos, depth, steps
        steps += 1
    return 1, pos, depth, steps


def empirical_normal(sdf, p, eps=1e-3):
    g = np.zeros(3)
    for a in range(3):
        e = np.zeros(3)
        e[a] = eps
        g[a] = (-sdf(p + 2 * e) + 8 * sdf(p + e) - 8 * sdf(p - e) + sdf(p - 2 * e))
    return g / np.linalg.norm(g)


def aces(rgb):
    m1 = np.array([
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ])
    m2 = np.array([
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ])
    v = m1 @ rgb
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return np.clip(m2 @ (a / b), 0.0, 1.0)


def camera_ray(px, py, cam_pos, forward, up, right, fov,
               tex_w, tex_h, screen_w, screen_h):
    """texture coord -> world ray (common.cu:15-88)."""
    ndc_x = (px + 0.5) / tex_w
    ndc_y = (py + 0.5) / tex_h
    cx = (2 * ndc_x - 1) * (tex_w / tex_h)
    cy = 1 - 2 * ndc_y
    width_factor = (screen_w / tex_w) * (tex_h / screen_h)
    fov_fac = np.tan(fov / 2)
    d = forward + cy * fov_fac * up + cx * fov_fac * width_factor * right
    return d / np.linalg.norm(d)


def pixel_cone_radius(px, py, cam_pos, forward, up, right, fov,
                      tex_w, tex_h, screen_w, screen_h):
    s = 0.7071067811865475
    center = camera_ray(px, py, cam_pos, forward, up, right, fov,
                        tex_w, tex_h, screen_w, screen_h)
    best = 0.0
    for dx in (-s, s):
        for dy in (-s, s):
            c = camera_ray(px + dx, py + dy, cam_pos, forward, up, right, fov,
                           tex_w, tex_h, screen_w, screen_h)
            best = max(best, np.linalg.norm(center - c))
    return best


def render(width, height, cam_pos, forward, up, right, fov,
           screen_w=None, screen_h=None, sdf=sd_scene,
           x0=0, y0=0, tile_w=None, tile_h=None):
    """Full reference render loop (compute_render.cu:21-97) in NumPy.

    ``x0/y0/tile_w/tile_h`` render only a tile of the full ``width x height``
    target — the per-pixel camera/cone math still uses the full-image
    coordinates, so a tile pins the exact operating point (cone radius, ray
    spread) of the full-resolution render at tile cost."""
    screen_w = screen_w or float(width)
    screen_h = screen_h or float(height)
    tile_w = tile_w or width - x0
    tile_h = tile_h or height - y0
    light = np.ones(3) / np.sqrt(3)
    low = np.array([19.0, 9.0, 130.0]) / 255.0
    high = np.array([240.0, 103.0, 24.0]) / 255.0

    img = np.zeros((tile_h, tile_w, 3), np.float32)
    for y in range(y0, y0 + tile_h):
        for x in range(x0, x0 + tile_w):
            d = camera_ray(x, y, cam_pos, forward, up, right, fov,
                           width, height, screen_w, screen_h)
            cone = pixel_cone_radius(x, y, cam_pos, forward, up, right, fov,
                                     width, height, screen_w, screen_h)
            outcome, pos, depth, steps = ray_march(sdf, cam_pos, d, cone)
            if outcome == 0:
                n = empirical_normal(sdf, pos)
                t = (np.dot(n, light) + 1.0) / 2.0
                color = low + t * (high - low)
            elif outcome == 1:
                color = np.ones(3)
            else:
                color = np.zeros(3)
            img[y - y0, x - x0] = aces(color)
    return img

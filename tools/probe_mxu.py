"""On-chip probe (round 5): MXU-contraction trilinear interpolation — the
gather-free grid sampler. Validated compile + accuracy on the v5e; this form
became ops/pallas/grid_kernel.py::make_contraction_csdf."""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32
R2 = R * R
G = 512  # 4 rows of 128 lanes grouped along lanes

T3 = (jnp.arange(R*R2, dtype=jnp.float32) % 97).reshape(R, R, R)
T2 = T3.reshape(R2, R).T  # (R, R2): [z, x*R+y]
cx = jax.random.uniform(jax.random.PRNGKey(0), (1, G), minval=0.0, maxval=R-1.001)
cy = jax.random.uniform(jax.random.PRNGKey(1), (1, G), minval=0.0, maxval=R-1.001)
cz = jax.random.uniform(jax.random.PRNGKey(2), (1, G), minval=0.0, maxval=R-1.001)

def body(t2, cx, cy, cz):
    a = lax.broadcasted_iota(jnp.int32, (R, G), 0).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - a))      # (R, G)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - a))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(cz - a))
    wxy = jnp.repeat(wx, R, axis=0) * jnp.tile(wy, (R, 1))   # (R2, G)
    v1 = jnp.dot(t2, wxy, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (R, G)
    return jnp.sum(v1 * wz, axis=0, keepdims=True)    # (1, G)

def kernel(t_ref, x_ref, y_ref, z_ref, o_ref):
    o_ref[:] = body(t_ref[:], x_ref[:], y_ref[:], z_ref[:])

try:
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
    )(T2, cx, cy, cz)
    # oracle: direct trilinear via numpy gathers
    t3 = np.asarray(T3)
    def tri(c3, q):
        x0 = np.floor(q).astype(int); f = q - x0; x1 = np.minimum(x0+1, R-1)
        return x0, x1, f
    X0, X1, FX = tri(t3, np.asarray(cx)[0]); Y0, Y1, FY = tri(t3, np.asarray(cy)[0]); Z0, Z1, FZ = tri(t3, np.asarray(cz)[0])
    exp = np.zeros(G)
    for dx, wxv in ((X0, 1-FX), (X1, FX)):
        for dy, wyv in ((Y0, 1-FY), (Y1, FY)):
            for dz, wzv in ((Z0, 1-FZ), (Z1, FZ)):
                exp += wxv*wyv*wzv * t3[dx, dy, dz]
    err = np.abs(np.asarray(out)[0] - exp).max()
    print("COMPILED; max err vs trilinear oracle:", err)
except Exception as e:
    print("FAIL:", type(e).__name__, str(e).splitlines()[0][:200])

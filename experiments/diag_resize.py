import numpy as np
import jax, jax.numpy as jnp
from floodseg_tpu.ops.pallas_resize import resize_quantize_int8, _round_to_bf16_grid
from floodseg_tpu.ops.quant import quantize_with_scale, scale_from_absmax
from floodseg_tpu.ops.resize import resize_bilinear, _interp_matrix

rng = np.random.default_rng(11)
shape = (23, 32, 32, 4096)
x = jnp.asarray(rng.standard_normal(shape) * 2.5, jnp.bfloat16)
scale = scale_from_absmax(jnp.max(jnp.abs(x.astype(jnp.float32))))
out_hw = (65, 65)

ref = np.asarray(jax.jit(lambda x, s: quantize_with_scale(
    resize_bilinear(x, out_hw, True, fast_lowp=True), s))(x, scale))
ours = np.asarray(resize_quantize_int8(x, scale, out_hw, True))

d = ours.astype(np.int32) - ref.astype(np.int32)
print("mismatch rate vs jitted comp:", (d != 0).mean(), "max|d|:", np.abs(d).max())

# variant A: composition with an explicit fold-proof output round
def compA(x, s):
    cdt = x.dtype
    mh = jnp.asarray(_interp_matrix(32, 65, True), dtype=cdt)
    mw = jnp.asarray(_interp_matrix(32, 65, True), dtype=cdt)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    y = jnp.einsum("pw,bhwc->bhpc", mw, y, precision="highest")
    yf = _round_to_bf16_grid(y.astype(jnp.float32))
    q = jnp.clip(jnp.round(yf / s), -127, 127)
    return q.astype(jnp.int8)
refA = np.asarray(jax.jit(compA)(x, scale))
dA = ours.astype(np.int32) - refA.astype(np.int32)
print("mismatch vs fold-proof round comp:", (dA != 0).mean(), "max|d|:", np.abs(dA).max())

# variant B: composition WITHOUT the final bf16 round (f32 all the way out)
def compB(x, s):
    cdt = x.dtype
    mh = jnp.asarray(_interp_matrix(32, 65, True), dtype=cdt)
    mw = jnp.asarray(_interp_matrix(32, 65, True), dtype=cdt)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    y = jnp.einsum("pw,bhwc->bhpc", mw, y.astype(cdt), precision="highest",
                   preferred_element_type=jnp.float32)
    q = jnp.clip(jnp.round(y / s), -127, 127)
    return q.astype(jnp.int8)
refB = np.asarray(jax.jit(compB)(x, scale))
dB = ref.astype(np.int32) - refB.astype(np.int32)
print("jitted comp vs unrounded-output comp:", (dB != 0).mean(), "max|d|:", np.abs(dB).max())

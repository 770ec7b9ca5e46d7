"""Probe which Mosaic lowerings exist on this toolchain (tiny kernels,
seconds each). Facts needed to shape the fused Res2 kernel:
  a) ref READ at unaligned sublane offset -> canonical-layout value
  b) ref STORE at unaligned sublane offset
  c) reshape [F, T, C] -> [F*T, C] when T is not a multiple of the sublane tile
  d) lane-dim concat of 9 ref-loaded (canonical) values + matmul
  e) unaligned lane-dim slice of a loaded value (h[..., :w], h[..., w:])
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

F, T, W = 16, 50, 26
DT = jnp.bfloat16


def run(name, kernel, out_shape, *args, scratch_shapes=()):
    try:
        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, DT),
            scratch_shapes=list(scratch_shapes))
        r = np.asarray(jax.jit(fn)(*args))
        print(f"[OK]   {name}  sum={float(r.astype(np.float32).sum()):.3f}",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")
        key = next((l for l in msg if "implement" in l.lower()
                    or "error" in l.lower()), msg[0])
        print(f"[FAIL] {name}: {key[:160]}", flush=True)
        return False


def main():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((F, T, W)), DT)

    def k_read_unaligned(x_ref, o_ref):
        o_ref[:] = x_ref[:, 1:T - 1, :] * 2.0

    run("a. unaligned sublane ref read", k_read_unaligned, (F, T - 2, W), x)

    def k_store_unaligned(x_ref, o_ref):
        o_ref[:, 2:T, :] = x_ref[:, 0:T - 2, :]
        o_ref[:, 0:2, :] = jnp.zeros((F, 2, W), DT)

    run("b. unaligned sublane ref store", k_store_unaligned, (F, T, W), x)

    def k_reshape_merge(x_ref, o_ref):
        v = x_ref[:].reshape(F * T, W)
        o_ref[:] = (v * 2.0).reshape(F, T, W)

    run("c. misaligned 3D->2D merge reshape", k_reshape_merge, (F, T, W), x)

    w9 = jnp.asarray(np.random.default_rng(1).standard_normal((9 * W, W)), DT)

    def k_concat_from_refs(x_ref, w_ref, o_ref, s_ref):
        s_ref[:] = jnp.pad(x_ref[:], ((1, 1), (0, 0), (0, 0)))
        pieces = [s_ref[df:df + F, dt:dt + T - 2, :]
                  for df in range(3) for dt in range(3)]
        a = jnp.concatenate(pieces, axis=-1)
        a2 = a.reshape(F * (T - 2), 9 * W)
        y = jnp.dot(a2, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = y.astype(DT).reshape(F, T - 2, W)

    run("d. concat of ref-loaded pieces + matmul", k_concat_from_refs,
        (F, T - 2, W), x, w9,
        scratch_shapes=[pltpu.VMEM((F + 2, T, W), DT)])

    w2 = jnp.asarray(np.random.default_rng(2).standard_normal((W, 2 * W)), DT)

    def k_lane_slice(x_ref, w_ref, o_ref):
        h = jnp.dot(x_ref[:].reshape(F * T, W), w_ref[:],
                    preferred_element_type=jnp.float32).astype(DT)
        s1, s2 = h[:, :W], h[:, W:]
        o_ref[:] = (s1 + s2).reshape(F, T, W)

    run("e. unaligned lane slice of matmul out", k_lane_slice, (F, T, W),
        x, w2)


if __name__ == "__main__":
    main()

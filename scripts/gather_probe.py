"""Probe: what table shapes can Mosaic's ``tpu.dynamic_gather`` serve?

Context (round 2): the fused rollout kernel needs ``word[m][cell]`` lookups
from per-map tables far larger than one vector register.  The obvious fix
(VERDICT round 1, "two-level gather") would gather the chunk row by
``cell // 128`` and within the row by ``cell % 128``.  This probe measures
what the hardware/Mosaic stack actually supports, by emitting the raw
``tpu.dynamic_gather`` op through a custom Pallas lowering.

MEASURED RESULT on TPU v5e (jax 0.9.0, 2026-08):

* lane gather  (dims=[1]): table limited to 128 lanes per sublane row
  (the supported ``jnp.take_along_axis(..., axis=1)`` path).
* sublane gather (dims=[0]): works WITH index shape != table shape
  (idx (R, 128) vs table (S, 128)), but ONLY for S <= 8 — one vreg:
  "Not implemented: Multiple source vregs along gather dimension".
* 2D gather (dims=[0, 1]): "Not implemented: Zero or multiple gather
  dimensions".

Conclusion: there is NO tall-table hardware gather; any lookup beyond one
vreg along the gather dim must be a chunk walk of gather+select ops.  The
production kernel therefore reduces the walk length by packing 4 cells per
int32 word (4-bit PMF bin indices) instead — see
``ops/pallas/rollout_kernel.py``.

Run ON the real TPU (no other TPU process!):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/gather_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import core as jax_core
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.extend.core import Primitive
from jax.interpreters import mlir

ITERS = 512

# -- raw tpu.dynamic_gather as a primitive (probe-only; not a product API) --

column_gather_p = Primitive("probe_column_gather")
flat_gather_p = Primitive("probe_flat_gather")


def _cg_aeval(table, idx):
    assert table.shape[1] == idx.shape[1], (table.shape, idx.shape)
    return jax_core.ShapedArray(idx.shape, table.dtype)


def _cg_ref(table, idx):
    return jnp.take_along_axis(table, idx % table.shape[0], axis=0)


def _fg_aeval(table, idx):
    return jax_core.ShapedArray(idx.shape, table.dtype)


def _fg_ref(table, idx):
    n = table.shape[0] * table.shape[1]
    return table.reshape(-1)[(idx % n).reshape(-1)].reshape(idx.shape)


for prim, aeval, ref in ((column_gather_p, _cg_aeval, _cg_ref),
                         (flat_gather_p, _fg_aeval, _fg_ref)):
    prim.def_abstract_eval(aeval)
    prim.def_impl(ref)
    mlir.register_lowering(prim, mlir.lower_fun(ref, multiple_results=False))


def _register_mosaic():
    from jax._src.pallas.mosaic import lowering as mosaic_lowering
    from jax.experimental.mosaic.dialects import tpu as tpu_dialect

    @mosaic_lowering.register_lowering_rule(column_gather_p)
    def _cg_rule(ctx, table, idx):  # noqa: ANN001
        del ctx
        return tpu_dialect.dynamic_gather(table, idx, [0])

    @mosaic_lowering.register_lowering_rule(flat_gather_p)
    def _fg_rule(ctx, table, idx):  # noqa: ANN001
        del ctx
        return tpu_dialect.dynamic_gather(table, idx, [0, 1])


_register_mosaic()


def make_kernel(prim, S, R, L, mod, iters=ITERS):
    def kernel(table_ref, idx_ref, out_ref):
        table = table_ref[:]

        def body(_, idx):
            g = prim.bind(table, idx)
            # feed gathered value back into the next index (dependency chain)
            return (g ^ idx) % jnp.int32(mod)

        out_ref[:] = jax.lax.fori_loop(0, iters, body, idx_ref[:])

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def reference(prim_ref, table, idx, mod, iters=ITERS):
    t = np.asarray(table)
    x = np.asarray(idx)
    for _ in range(iters):
        g = np.asarray(prim_ref(jnp.asarray(t), jnp.asarray(x)))
        x = (g ^ x) % mod
    return x


def probe(name, prim, prim_ref, sizes, R=32, L=128):
    rng = np.random.RandomState(0)
    for S in sizes:
        mod = S * (L if prim is flat_gather_p else 1)
        table = jnp.asarray(
            rng.randint(0, 1 << 20, size=(S, L)).astype(np.int32))
        idx = jnp.asarray(rng.randint(0, mod, size=(R, L)).astype(np.int32))
        try:
            run = make_kernel(prim, S, R, L, mod)
            out = np.asarray(run(table, idx))
        except Exception as e:  # noqa: BLE001
            lines = [ln for ln in str(e).splitlines()
                     if "Not implemented" in ln or "rror" in ln]
            msg = (lines[0] if lines else str(e).splitlines()[0])[:120]
            print(f"{name} S={S:6d}: FAILED: {msg}")
            continue
        ok = np.array_equal(out, reference(prim_ref, table, idx, mod))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = run(table, idx)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (reps * ITERS)
        print(f"{name} S={S:6d}: correct={ok}  {dt * 1e9:8.1f} ns/gather "
              f"({R}x{L} tile)")


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    print("backend:", jax.default_backend())
    probe("sublane dims=[0]   ", column_gather_p, _cg_ref,
          (8, 64, 512, 6568))
    probe("2D      dims=[0,1] ", flat_gather_p, _fg_ref, (8,))


if __name__ == "__main__":
    main()

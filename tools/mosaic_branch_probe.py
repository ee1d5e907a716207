"""Which data-dependent skip mechanisms does Mosaic actually honor?

The r4 adaptive-kernel investigation found that NEITHER `lax.while_loop`
(any condition phrasing) NOR `pl.when` on an SMEM scalar written from a
vector reduce skips work on hardware: wall scales exactly with the static
step budget (694 ms at max_steps=32 vs 349 ms at 16; all-accept ~= default).
Yet the deep kernels' padding-prefix skip — dynamic `fori_loop` bounds from
SMEM scalars — measurably works (6.5x fewer row-steps, r2).

Hypothesis: predicates RESOLVABLE BY THE SCALAR UNIT AHEAD of the vector
stream (SMEM inputs, loop indices) become real branches / trip counts;
predicates produced by the VECTOR unit mid-loop get lowered to vector
predication, which executes everything.

This probe times one expensive vector body (64 fused multiply-adds on an
(8, 128) tile) under each mechanism, with a data-dependent 'done' flag that
flips after `FLIP` of `TOTAL` iterations:

  always   — no skip: the roofline for "executes everything"
  when     — pl.when(go_scr[0] > 0), go_scr written from a vector reduce
  dynfori  — chunked: outer fori over TOTAL/CH chunks, inner fori with a
             DYNAMIC bound (CH or 0) read from the same SMEM flag
  dynval   — inner fori bound computed directly from the vector reduce

If a mechanism works, its wall is ~FLIP/TOTAL of `always`.

Usage: python tools/mosaic_branch_probe.py  (on TPU)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTAL = 64   # iterations in the budget
FLIP = 8     # iterations after which the flag drops
CH = 4       # chunk size for the chunked variants
REPS = 256   # grid steps, to get measurable wall


def body_work(x):
    # ~64 dependent FMAs on an (8, 128) tile — expensive enough that a
    # skipped iteration is clearly visible; growth must be WELL above f32
    # eps or the flag never flips (the first probe version used 1e-7 steps,
    # a device-side no-op at x=1 — every mechanism correctly ran the full
    # budget and the probe said nothing)
    for _ in range(64):
        x = x * 1.001 + 0.001
    return x


def make_kernel(mode: str):
    def kernel(x_ref, o_ref, acc, go_scr):
        acc[...] = x_ref[0]
        go_scr[0] = jnp.int32(1)

        def flag():
            # data-dependent flip: mean grows past the threshold after
            # ~FLIP iterations of body_work
            return (jnp.sum(acc[...]) < THRESH).astype(jnp.int32)

        if mode == "always":
            def it(i, _):
                acc[...] = body_work(acc[...])
                return 0

            jax.lax.fori_loop(0, TOTAL, it, 0)
        elif mode == "when":
            def it(i, _):
                @pl.when(go_scr[0] > 0)
                def _():
                    acc[...] = body_work(acc[...])
                    go_scr[0] = flag()
                return 0

            jax.lax.fori_loop(0, TOTAL, it, 0)
        elif mode == "dynfori":
            def chunk(c, _):
                bound = jnp.where(go_scr[0] > 0, CH, 0)

                def it(i, _):
                    acc[...] = body_work(acc[...])
                    return 0

                jax.lax.fori_loop(0, bound, it, 0)
                go_scr[0] = flag()
                return 0

            jax.lax.fori_loop(0, TOTAL // CH, chunk, 0)
        elif mode == "dynval":
            def chunk(c, go):
                def it(i, _):
                    acc[...] = body_work(acc[...])
                    return 0

                jax.lax.fori_loop(0, jnp.where(go > 0, CH, 0), it, 0)
                return flag()

            jax.lax.fori_loop(0, TOTAL // CH, chunk, jnp.int32(1))
        o_ref[0] = acc[...]

    return kernel


# flag threshold: after k iterations of body_work on ones, value ~
# (1 + 1e-7)^... — compute the flip point numerically on host
def thresh_after(k):
    # f32 on host, exactly the device arithmetic; threshold at the midpoint
    # between the value after FLIP and FLIP+1 iterations
    import numpy as np

    x = np.ones((), np.float32)
    vals = [x]
    for i in range((k + 1) * 64):
        x = np.float32(x * np.float32(1.001) + np.float32(0.001))
        vals.append(x)
    lo, hi = float(vals[k * 64]), float(vals[(k + 1) * 64])
    return 0.5 * (lo + hi) * 8 * 128


THRESH = thresh_after(FLIP)


def run(mode: str) -> float:
    x = jnp.ones((REPS, 8, 128), jnp.float32)
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(REPS,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((REPS, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
    )
    g = jax.jit(lambda x: jnp.sum(f(x)))
    float(g(x))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    base = None
    for mode in ("always", "when", "dynfori", "dynval"):
        try:
            t = run(mode)
        except Exception as e:  # legalization failures are findings too
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        if base is None:
            base = t
        print(f"{mode:8s} {t * 1e3:8.2f} ms  ({t / base:5.2f}x of always; "
              f"ideal skip ~{(FLIP / TOTAL):4.2f}x)", flush=True)


if __name__ == "__main__":
    main()

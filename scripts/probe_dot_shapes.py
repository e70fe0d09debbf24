#!/usr/bin/env python
"""Isolated MXU efficiency of the flagship kernels' exact dot shapes,
measured IN PALLAS (plain-XLA integer dots do not use the MXU — a first
version of this probe measured 0.2% of peak through XLA, which is why
every herdsman engine is a pallas kernel in the first place).

The mega13 session budget has ~40 ms/2048-batch of "sub-peak dot
efficiency" that neither lane width, dot granularity, nor group geometry
moves.  This times the EXACT dot shapes in a minimal pallas kernel
(VMEM-resident operands, i32 accumulator scratch — the same dataflow as
the mega kernels' inner loop) so the residual can be attributed either
to the shape itself or to inter-op effects in the full kernel.

Run alone: timeout 1800 python scripts/probe_dot_shapes.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SHAPES = [
    # (M, K, L, label)
    (1536, 1024, 128, "mega13 per-c dot [C4P,2N]x[2N,Bt]"),
    (1536, 3072, 128, "merged-c dot (mega14 class)"),
    (1024, 8192, 128, "mega15 l=4 dot"),
    (2048, 2048, 256, "fat reference shape"),
    (512, 1024, 128, "mega16 wrap-split piece (avg)"),
]

PEAK_TOPS = 197.0  # v5e int8 (roofline basis, utils/roofline.py)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(3)
    S = 2  # operand stack depth inside the kernel

    for M, K, L, label in SHAPES:
        T = max(8, int(5e10 // (S * M * K * L)))  # ~50 GMAC per call
        A = jnp.asarray(rng.integers(-128, 128, (S, M, K), dtype=np.int8))
        B = jnp.asarray(rng.integers(-128, 128, (S, K, L), dtype=np.int8))

        def kernel(a_ref, b_ref, out_ref, acc, *, T=T):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            total = acc[...]
            for s in range(S):
                total = total + jnp.dot(a_ref[s], b_ref[s],
                                        preferred_element_type=jnp.int32)
            acc[...] = total

            @pl.when(i == T - 1)
            def _():
                out_ref[...] = acc[...]

        fn = pl.pallas_call(
            functools.partial(kernel),
            grid=(T,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[
                pl.BlockSpec((S, M, K), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, K, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, L), jnp.int32),
            scratch_shapes=[pltpu.VMEM((M, L), jnp.int32)],
            interpret=jax.default_backend() != "tpu",
        )
        fn_j = jax.jit(lambda a, b, f=fn: f(a, b))
        try:
            np.asarray(fn_j(A, B))  # compile + warm
        except Exception as e:  # noqa: BLE001 — keep probing other shapes
            print(f"{label:38s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn_j(A, B))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        tops = S * T * M * K * L / best / 1e12
        print(f"{label:38s} [{M:>4},{K:>4}]x[{K:>4},{L:>4}] "
              f"{tops:6.1f} TOPS = {100 * tops / PEAK_TOPS:5.1f}% peak "
              f"({S * T} dots, {best * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

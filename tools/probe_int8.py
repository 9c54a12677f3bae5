#!/usr/bin/env python3
"""Feasibility micro-probe for int8 MXU vote dots (VERDICT r3 task #3,
second untried formulation): times a bare [M, C] x [C, N] dot inside a
Pallas kernel at the vote shape (M=96, C=1280, N=384) in bf16 vs int8
(int32 accumulate), plus the int8 operand build cost (f32 -> int8
convert of tent-style corner blocks).  If the int8 dot is not ~2x the
bf16 dot on this chip/Mosaic, the int8 corner-build candidate is dead
before any kernel surgery.

    python tools/probe_int8.py [M C N]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # positional overrides fill in order M, C, N; unspecified trailing
    # dims keep their documented defaults (a partial arg list must not
    # shift the defaults into the wrong slots)
    defaults = [96, 1280, 384]
    args = [int(a) for a in sys.argv[1:4]]
    M, C, N = args + defaults[len(args):]
    STEPS = 32  # chunks per launch, mimics the grid

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (STEPS, M, C)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (STEPS, C, N)), jnp.int8)
    a16 = a8.astype(jnp.bfloat16)
    b16 = b8.astype(jnp.bfloat16)
    af = a8.astype(jnp.float32)
    bf = b8.astype(jnp.float32)

    def make(mode):
        def kernel(a_ref, b_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            a = a_ref[:]
            b = b_ref[:]
            if mode == "bf16_built2":
                # BOTH operands arrive f32 and convert in-kernel — the
                # faithful model of the real kernel (blocks built f32 by
                # selects, cast before the dot).  bf16_built2 and
                # int8_built2 stream IDENTICAL bytes, so their delta is
                # purely (convert + dot) bf16-vs-int8.
                p = jax.lax.dot_general(
                    a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:] += p
            elif mode == "int8_built2":
                p = jax.lax.dot_general(
                    a.astype(jnp.int8), b.astype(jnp.int8),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                o_ref[:] += p.astype(jnp.float32)
            elif mode == "bf16_built":
                # the fair baseline: the real kernel builds blocks in f32
                # and converts to bf16 before the dot
                p = jax.lax.dot_general(
                    a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:] += p
            elif mode == "int8":
                p = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                o_ref[:] += p.astype(jnp.float32)
            elif mode == "int8_built":
                # include the build-side convert the real kernel would pay
                p = jax.lax.dot_general(
                    a.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                o_ref[:] += p.astype(jnp.float32)
            else:
                p = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:] += p

        ins = {
            "bf16": (a16, b16),
            "bf16_built": (af, b16),  # a arrives f32, converts in-kernel
            "bf16_built2": (af, bf),
            "int8": (a8, b8),
            "int8_built": (af, b8),  # a arrives f32, converts in-kernel
            "int8_built2": (af, bf),
        }[mode]

        call = pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((None, M, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((None, C, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )

        @jax.jit
        def run(iters, scale):
            def body(i, acc):
                # perturb the first operand data-dependently so the call
                # cannot be hoisted out of the loop (the perturbation is
                # the same cheap elementwise add in every variant)
                if ins[0].dtype == jnp.int8:
                    a_i = ins[0] + (i % 2).astype(jnp.int8)
                else:
                    a_i = ins[0] + (i % 2).astype(ins[0].dtype) + acc.astype(ins[0].dtype) * 1e-20
                return acc + call(a_i, ins[1]).sum() * (1.0 + scale * 1e-20)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    runners = {
        m: make(m)
        for m in ("bf16", "bf16_built2", "int8", "int8_built2")
    }
    est = {}
    for name, run in runners.items():
        t0 = time.perf_counter()
        try:
            float(run(4, 0.0))
        except Exception as e:
            print(f"{name}: FAILED to compile/run: {type(e).__name__}: {e}", flush=True)
            runners[name] = None
            continue
        print(f"{name}: compile+4 iters {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter(); float(run(16, 1.0)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(128, 2.0)); b = time.perf_counter() - t0
        est[name] = max((b - a) / 112, 1e-6)

    results = {}
    for rep in range(3):
        for name, run in runners.items():
            if run is None:
                continue
            di = int(min(max(np.ceil(0.8 / est[name]), 64), 50_000))
            i1, i2 = di // 4, di // 4 + di
            t0 = time.perf_counter(); float(run(i1, rep + 3.0)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(i2, rep + 4.0)); b = time.perf_counter() - t0
            results.setdefault(name, []).append((b - a) / (i2 - i1))
    print()
    for name, ms in results.items():
        ms = sorted(ms)
        med = ms[len(ms) // 2]
        print(
            f"{name:11s} median {med * 1e3:.4f} ms/iter ({STEPS} dots of "
            f"[{M},{C}]x[{C},{N}])   samples={[f'{m*1e3:.4f}' for m in ms]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

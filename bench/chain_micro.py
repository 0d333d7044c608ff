"""Micro-bench: one fused bottleneck chain vs per-layer XLA vs per-block
Pallas on the real chip.  Usage:

    python bench/chain_micro.py [--stage 4] [--batch 128] [--nb 5]

Stage presets (ResNet-50 identity-block signatures):
    2 -> 56x56, C=256,  Cm=64     3 -> 28x28, C=512,  Cm=128
    4 -> 14x14, C=1024, Cm=256    5 -> 7x7,   C=2048, Cm=512
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = {2: (56, 256, 64, 2), 3: (28, 512, 128, 3),
          4: (14, 1024, 256, 5), 5: (7, 2048, 512, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nb", type=int, default=0, help="0 = stage default")
    ap.add_argument("--what", default="chain,xla,block",
                    help="comma list: chain|xla|block|ctx|proj")
    ap.add_argument("--plan", default=None,
                    help="chunk,slab_rows override for the chain kernel")
    ap.add_argument("--fold", type=int, default=None,
                    help="conv2 tap fold (1|3|9)")
    ap.add_argument("--idchunk", type=int, default=2,
                    help="batch chunk for the idctx identity kernel")
    args = ap.parse_args()
    plan = (tuple(int(v) for v in args.plan.split(","))
            if args.plan else None)

    import jax
    import jax.numpy as jnp
    from feathercnn_tpu.utils.timing import device_bench

    HW, C, Cm, nb_def = STAGES[args.stage]
    nb = args.nb or nb_def
    N = args.batch
    rng = np.random.default_rng(0)

    flops = 2.0 * N * HW * HW * (2 * C * Cm + 9 * Cm * Cm) * nb
    print(f"stage{args.stage}: {HW}x{HW} C={C} Cm={Cm} nb={nb} b{N} "
          f"-> {flops/1e9:.1f} GFLOP/step", flush=True)

    x8 = rng.integers(-127, 128, size=(N, HW, HW, C), dtype=np.int8)
    w1 = rng.integers(-127, 128, size=(nb, C, Cm), dtype=np.int8)
    w2 = rng.integers(-127, 128, size=(nb, 9 * Cm, Cm), dtype=np.int8)
    w3 = rng.integers(-127, 128, size=(nb, Cm, C), dtype=np.int8)
    b1 = np.zeros((nb, Cm), np.float32)
    b2 = np.zeros((nb, Cm), np.float32)
    b3 = np.zeros((nb, C), np.float32)
    s = 0.02
    w1s = np.full((nb, Cm), 1e-3, np.float32)
    w2s = np.full((nb, Cm), 1e-3, np.float32)
    w3s = np.full((nb, C), 1e-3, np.float32)
    sx = (s,) * nb
    scales = (sx, sx, sx, s)

    what = args.what.split(",")

    if "chain" in what:
        from feathercnn_tpu.kernels.fused_chain import chain_plan, fused_chain
        eff = plan or chain_plan(N, HW, HW, C, Cm, nb, 1, 1)
        print(f"plan: chunk={eff[0]} slab={eff[1]}", flush=True)
        t = device_bench(
            lambda a: fused_chain(a, jnp.asarray(w1), jnp.asarray(b1),
                                  jnp.asarray(w2), jnp.asarray(b2),
                                  jnp.asarray(w3), jnp.asarray(b3),
                                  w_scales=(jnp.asarray(w1s),
                                            jnp.asarray(w2s),
                                            jnp.asarray(w3s)),
                                  scales=scales, plan_override=plan,
                                  conv2_fold=args.fold),
            [jnp.asarray(x8)], iters=20)
        print(f"chain : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s",
              flush=True)

    if "block" in what:
        from feathercnn_tpu.kernels.fused_chain import fused_chain

        def blocks(a):
            for j in range(nb):
                a = fused_chain(
                    a, jnp.asarray(w1[j:j + 1]), jnp.asarray(b1[j:j + 1]),
                    jnp.asarray(w2[j:j + 1]), jnp.asarray(b2[j:j + 1]),
                    jnp.asarray(w3[j:j + 1]), jnp.asarray(b3[j:j + 1]),
                    w_scales=(jnp.asarray(w1s[j:j + 1]),
                              jnp.asarray(w2s[j:j + 1]),
                              jnp.asarray(w3s[j:j + 1])),
                    scales=((s,), (s,), (s,), s))
            return a
        t = device_bench(blocks, [jnp.asarray(x8)], iters=20)
        print(f"block : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s",
              flush=True)

    if "ctx" in what:
        # in-graph context probe: producer conv -> region -> consumer
        # conv, region = chain kernel vs per-layer XLA.  Isolates the
        # custom-call boundary cost that whole-model benches see.
        from feathercnn_tpu.kernels.fused_chain import fused_chain
        win = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C),
                                       dtype=np.int8))
        wout = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C // 2),
                                        dtype=np.int8))

        def prod(a):
            y = jax.lax.conv_general_dilated(
                a, win, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(y.astype(jnp.float32) * (1e-3 * s), 0)
            return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

        def cons(a):
            y = jax.lax.conv_general_dilated(
                a, wout, (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32).sum()

        def region_chain(a):
            return fused_chain(prod(a), jnp.asarray(w1), jnp.asarray(b1),
                               jnp.asarray(w2), jnp.asarray(b2),
                               jnp.asarray(w3), jnp.asarray(b3),
                               w_scales=(jnp.asarray(w1s),
                                         jnp.asarray(w2s),
                                         jnp.asarray(w3s)),
                               scales=scales, plan_override=plan)

        t = device_bench(lambda a: cons(region_chain(a)), [jnp.asarray(x8)],
                         iters=20)
        print(f"ctx-chain : {t*1e3:8.3f} ms", flush=True)

        from bench.ref_chains import xla_int8_bottlenecks

        t = device_bench(
            lambda a: cons(xla_int8_bottlenecks(
                prod(a), w1, w2, w3, w1s, w2s, w3s, s, nb, C, Cm)),
            [jnp.asarray(x8)], iters=20)
        print(f"ctx-xla   : {t*1e3:8.3f} ms", flush=True)

    if "idctx" in what:
        # boundary-cost isolation: producer -> IDENTITY pallas kernel ->
        # consumer vs producer -> consumer directly.  The delta is the
        # pure custom-call cost (layout/sync), independent of any real
        # kernel work.
        import jax.numpy as jnp2
        from jax.experimental import pallas as pl

        win = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C),
                                       dtype=np.int8))
        wout = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C // 2),
                                        dtype=np.int8))

        def prod(a):
            y = jax.lax.conv_general_dilated(
                a, win, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(y.astype(jnp.float32) * (1e-3 * s), 0)
            return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

        def cons(a):
            y = jax.lax.conv_general_dilated(
                a, wout, (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32).sum()

        chunk = args.idchunk

        def ident(x):
            q = N // chunk
            xs = x.reshape(q, chunk, HW, HW, C)

            def k(x_ref, o_ref):
                o_ref[0] = x_ref[0]

            out = pl.pallas_call(
                k, grid=(q,),
                in_specs=[pl.BlockSpec((1, chunk, HW, HW, C),
                                       lambda i: (i, 0, 0, 0, 0))],
                out_specs=pl.BlockSpec((1, chunk, HW, HW, C),
                                       lambda i: (i, 0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((q, chunk, HW, HW, C),
                                               x.dtype),
            )(xs)
            return out.reshape(N, HW, HW, C)

        t0 = device_bench(lambda a: cons(prod(a)), [jnp.asarray(x8)],
                          iters=20)
        print(f"idctx-none  : {t0*1e3:8.3f} ms", flush=True)
        t1 = device_bench(lambda a: cons(ident(prod(a))), [jnp.asarray(x8)],
                          iters=20)
        print(f"idctx-pallas: {t1*1e3:8.3f} ms  (boundary "
              f"{(t1-t0)*1e3:+.3f} ms)", flush=True)

    if "proj" in what:
        # projection-block cost in context (XLA only, measurement for
        # ROADMAP): branch1 1x1 C->4Cm, branch2a/b/c, eltwise — uses the
        # stage's (C, Cm) with C_in = C (stride 1, res2a-like).
        wb1 = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C),
                                       dtype=np.int8))
        wcons = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C),
                                         dtype=np.int8))

        def conv1x1(a, w):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        def proj_block(a):
            b1 = conv1x1(a, wb1).astype(jnp.float32) * (1e-3 * s)
            y = conv1x1(a, jnp.asarray(w1[0].reshape(1, 1, C, Cm)))
            y = jnp.maximum(y.astype(jnp.float32) * (w1s[0] * s), 0)
            y = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                y, jnp.asarray(w2[0].reshape(3, 3, Cm, Cm)), (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(y.astype(jnp.float32) * (w2s[0] * s), 0)
            y = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                y, jnp.asarray(w3[0].reshape(1, 1, Cm, C)), (1, 1),
                ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (w3s[0] * s)
            out = jnp.maximum(y + b1, 0)
            return jnp.clip(jnp.round(out / s), -127,
                            127).astype(jnp.int8)

        def cons2(a):
            return conv1x1(a, wcons).astype(jnp.float32).sum()

        t = device_bench(lambda a: cons2(proj_block(a)), [jnp.asarray(x8)],
                         iters=20)
        pf = 2.0 * N * HW * HW * (2 * C * Cm + 9 * Cm * Cm + C * C) \
            + 2.0 * N * HW * HW * C * C   # block + consumer conv
        print(f"proj-ctx : {t*1e3:8.3f} ms  (~{pf/t/1e12:.0f} TOP/s "
              f"incl consumer)", flush=True)

    if "xla" in what:
        # per-layer XLA int8 convs with int8 edges (the production path)
        from bench.ref_chains import xla_int8_bottlenecks
        t = device_bench(
            lambda a: xla_int8_bottlenecks(a, w1, w2, w3, w1s, w2s, w3s,
                                           s, nb, C, Cm),
            [jnp.asarray(x8)], iters=20)
        print(f"xla   : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Hard-synced microbenchmarks for the hot path (TPU via remote attach).

Every timing ends in a jax.device_get of a scalar reduction — on the
remote-attached backend block_until_ready does not reliably block (see
docs/PERF.md), so this is the only honest protocol. Calls are chained in
groups to amortize the ~29 ms sync round-trip.

  python -m cape_tpu.tools.perf_lab conv     # per-conv: XLA banded vs pallas v2
  python -m cape_tpu.tools.perf_lab layout   # batch-major vs vertex-major A/B
  python -m cape_tpu.tools.perf_lab parts    # enc/dec/disc fwd vs fwd+bwd
  python -m cape_tpu.tools.perf_lab step     # full train step at batch/dtype/K
  python -m cape_tpu.tools.perf_lab trace    # device-time attribution by source
  python -m cape_tpu.tools.perf_lab serve    # decode latency / recon throughput
  python -m cape_tpu.tools.perf_lab artifact # .capex decode (f32 vs int8 A/B)
  python -m cape_tpu.tools.perf_lab concurrency  # live-server load (micro-batch A/B)
"""

from __future__ import annotations

import argparse
import json
import time


def _timed(fn, args, iters=32, group=8, warmup=3):
    """Median per-call ms of jitted fn(*args); sync via scalar fetch."""
    import jax
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    times = []
    done = 0
    while done < iters:
        t0 = time.perf_counter()
        for _ in range(group):
            out = fn(*args)
        jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append((time.perf_counter() - t0) / group)
        done += group
    times.sort()
    return 1000.0 * times[len(times) // 2]


def _timed_chained(step, x0, extra, inner=128, reps=8, warmup=2):
    """Per-iteration ms of x <- step(x, *extra), chained `inner` times
    inside ONE jitted fori_loop — removes the per-dispatch relay overhead
    that floors small-op timings. The relay's sync round-trip is ~29 ms,
    so resolving sub-ms ops needs inner >> 29ms/op_ms (default 128 gives a
    ~0.23 ms floor). The data dependence through x prevents XLA from
    eliding iterations."""
    import jax

    @jax.jit
    def run(x, *extra):
        return jax.lax.fori_loop(0, inner, lambda i, x: step(x, *extra), x)

    for _ in range(warmup):
        out = run(x0, *extra)
    jax.device_get(out.ravel()[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0, *extra)
        jax.device_get(out.ravel()[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1000.0 * times[len(times) // 2] / inner


def _flagship_ctx(dtype, padded: bool = False, build_fused: bool = False):
    import numpy as np

    from cape_tpu.meshops import assets
    from cape_tpu.ops.sparse import build_graph_context

    verts, _ = assets.template_mesh()
    return build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts, dtype=np.dtype(dtype), padded=padded,
        build_fused=build_fused,
    )


def cmd_conv(args):
    """One K=2 Chebyshev conv at flagship level-0 shapes: XLA banded vs
    Pallas v2, fwd and fwd+bwd, f32 and bf16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.ops.cheb import cheb_conv
    from cape_tpu.ops.pallas.cheb_kernel import (
        cheb2_banded_pallas_v2,
        cheb2_banded_pallas_v5,
    )

    B, C, F = args.batch, args.channels, args.channels
    level = getattr(args, "level", 0)
    padded = bool(getattr(args, "padded", 0))
    results = {}
    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dtype_name)
        ctx = _flagship_ctx(dtype_name, padded=padded)
        lap = ctx.lap[level]
        V = lap.p_rows if padded else lap.n_rows
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, V, C)), dt)
        w = jnp.asarray(rng.standard_normal((2, C, F)) * 0.1, dt)

        def loss_xla(x, lap, w):
            return jnp.sum(cheb_conv(x, lap, w) ** 2)

        def loss_pal(x, lap, w):
            return jnp.sum(cheb2_banded_pallas_v2(x, lap, w) ** 2)

        def loss_v5(x, lap, w):
            return jnp.sum(cheb2_banded_pallas_v5(x, lap, w) ** 2)

        g_xla = jax.grad(loss_xla)
        g_pal = jax.grad(loss_pal)
        g_v5 = jax.grad(loss_v5)
        # chained inner iterations (C == F so output feeds input); the
        # fwd+bwd chain is a tiny gradient-descent loop on x
        r = {
            "xla_fwd_ms": _timed_chained(
                lambda x, lap, w: cheb_conv(x, lap, w), x, (lap, w)
            ),
            "pallas5_fwd_ms": _timed_chained(
                lambda x, lap, w: cheb2_banded_pallas_v5(x, lap, w), x, (lap, w)
            ),
            "xla_fwdbwd_ms": _timed_chained(
                lambda x, lap, w: x - 1e-6 * g_xla(x, lap, w), x, (lap, w)
            ),
            "pallas5_fwdbwd_ms": _timed_chained(
                lambda x, lap, w: x - 1e-6 * g_v5(x, lap, w), x, (lap, w)
            ),
        }
        if not padded:  # v2 predates the padded layout; baseline only
            r["pallas_fwd_ms"] = _timed_chained(
                lambda x, lap, w: cheb2_banded_pallas_v2(x, lap, w), x, (lap, w)
            )
            r["pallas_fwdbwd_ms"] = _timed_chained(
                lambda x, lap, w: x - 1e-6 * g_pal(x, lap, w), x, (lap, w)
            )
        # numeric agreement
        xla_fwd = jax.jit(lambda x, lap, w: cheb_conv(x, lap, w))
        v5_fwd = jax.jit(lambda x, lap, w: cheb2_banded_pallas_v5(x, lap, w))
        ref = np.asarray(jax.device_get(xla_fwd(x, lap, w)), np.float32)
        got = np.asarray(jax.device_get(v5_fwd(x, lap, w)), np.float32)
        n_nat = lap.n_rows
        r["max_rel_err_v5"] = float(
            np.max(np.abs(ref[:, :n_nat] - got[:, :n_nat]))
            / max(np.max(np.abs(ref[:, :n_nat])), 1e-9)
        )
        results[dtype_name] = {k: round(v, 4) for k, v in r.items()}
        print(
            json.dumps(
                {
                    "conv": dtype_name, "B": B, "C": C,
                    "level": level, "padded": padded,
                    **results[dtype_name],
                }
            ),
            flush=True,
        )
    return results


def cmd_layout(args):
    """A/B the activation layout for one K=2 conv at flagship level-0:
    batch-major [B, V, C] (current) vs vertex-major [V, B*C] (band einsum
    becomes T fat [128,128]@[128,B*C] matmuls, projection one [V*B,C]@[C,F]
    matmul), each fwd and fwd+bwd, plus the transpose-free Pallas v2 path.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.ops.cheb import cheb_conv
    from cape_tpu.ops.pallas.cheb_kernel import _pallas_band_apply_v2

    B, C, F = args.batch, args.channels, args.channels
    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dtype_name)
        ctx = _flagship_ctx(dtype_name)
        lap = ctx.lap[0]
        V = lap.n_rows
        S, T, rb, cb = lap.blocks.shape
        pl_, pr_ = lap.pad_left, lap.pad_right
        rng = np.random.default_rng(0)
        xb = jnp.asarray(rng.standard_normal((B, V, C)), dt)       # batch-major
        xv = jnp.asarray(rng.standard_normal((V, B * C)), dt)      # vertex-major
        w = jnp.asarray(rng.standard_normal((2, C, F)) * 0.1, dt)

        def conv_vm(xv, blocks, w):
            """K=2 cheb conv, vertex-major merged columns, pure XLA."""
            xp = jnp.pad(xv, ((pl_, pr_), (0, 0)))
            xt = xp.reshape(T + S - 1, cb, -1)
            lx = None
            for k in range(S):
                term = jnp.einsum(
                    "tij,tjm->tim", blocks[k].astype(xv.dtype), xt[k : k + T],
                    preferred_element_type=xv.dtype,
                )
                lx = term if lx is None else lx + term
            lx = lx.reshape(T * rb, -1)[:V]
            x3 = xv.reshape(V, B, C)
            l3 = lx.reshape(V, B, C)
            y = jnp.einsum("vbc,cf->vbf", x3, w[0]) + jnp.einsum(
                "vbc,cf->vbf", l3, w[1]
            )
            return y.reshape(V, B * F)

        @jax.custom_vjp
        def band_vm(xv, blocks):
            xp = jnp.pad(xv, ((pl_, pr_), (0, 0)))
            return _pallas_band_apply_v2(xp, blocks)[:V]

        def _band_vm_fwd(xv, blocks):
            return band_vm(xv, blocks), blocks

        def _band_vm_bwd(blocks, g):
            # rescaled Laplacian is symmetric: transpose apply reuses blocks
            return band_vm(g, blocks), jnp.zeros_like(blocks)

        band_vm.defvjp(_band_vm_fwd, _band_vm_bwd)

        def conv_vm_pallas(xv, blocks, w):
            lx = band_vm(xv, blocks.astype(xv.dtype))
            x3 = xv.reshape(V, B, C)
            l3 = lx.reshape(V, B, C)
            y = jnp.einsum("vbc,cf->vbf", x3, w[0]) + jnp.einsum(
                "vbc,cf->vbf", l3, w[1]
            )
            return y.reshape(V, B * F)

        g_bm = jax.grad(lambda x, lap, w: jnp.sum(cheb_conv(x, lap, w) ** 2))
        g_vm = jax.grad(lambda x, b, w: jnp.sum(conv_vm(x, b, w) ** 2))
        g_vp = jax.grad(lambda x, b, w: jnp.sum(conv_vm_pallas(x, b, w) ** 2))
        r = {
            "bm_fwd_ms": _timed_chained(
                lambda x, lap, w: cheb_conv(x, lap, w), xb, (lap, w)
            ),
            "vm_fwd_ms": _timed_chained(
                lambda x, b, w: conv_vm(x, b, w), xv, (lap.blocks, w)
            ),
            "vm_pallas_fwd_ms": _timed_chained(
                lambda x, b, w: conv_vm_pallas(x, b, w), xv, (lap.blocks, w)
            ),
            "bm_fwdbwd_ms": _timed_chained(
                lambda x, lap, w: x - 1e-6 * g_bm(x, lap, w), xb, (lap, w)
            ),
            "vm_fwdbwd_ms": _timed_chained(
                lambda x, b, w: x - 1e-6 * g_vm(x, b, w), xv, (lap.blocks, w)
            ),
            "vm_pallas_fwdbwd_ms": _timed_chained(
                lambda x, b, w: x - 1e-6 * g_vp(x, b, w), xv, (lap.blocks, w)
            ),
        }
        # correctness: vertex-major must match batch-major
        ref = jax.device_get(jax.jit(cheb_conv)(xb, lap, w)).astype(np.float32)
        xv_same = jnp.asarray(
            np.asarray(jax.device_get(xb)).transpose(1, 0, 2).reshape(V, B * C), dt
        )
        got = (
            np.asarray(jax.device_get(jax.jit(conv_vm)(xv_same, lap.blocks, w)))
            .reshape(V, B, F).transpose(1, 0, 2).astype(np.float32)
        )
        r["max_rel_err"] = float(
            np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-9)
        )
        print(json.dumps({"layout": dtype_name, "B": B, "C": C,
                          **{k: round(v, 4) for k, v in r.items()}}), flush=True)


def cmd_fuse(args):
    """Fusion experiments on one K=2 conv: (a) the S shifted band einsums
    collapsed into ONE batched GEMM against pre-concatenated blocks
    [T, rb, S*cb] (fewer, fatter kernels); (b) project-first (Clenshaw)
    ordering y = x@W0 + A(x@W1), which runs the band apply on Fout instead
    of Fin channels — a bandwidth win whenever Fout < Fin (all decoder
    convs). Measured per-conv fwd and fwd+bwd at configurable (C, F)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.ops.cheb import cheb_conv

    B, C, F = args.batch, args.channels, args.fout or args.channels
    for dtype_name in ("float32", "bfloat16") if args.dtype == "both" else (args.dtype,):
        dt = jnp.dtype(dtype_name)
        ctx = _flagship_ctx(dtype_name)
        lap = ctx.lap[args.level]
        V = lap.n_rows
        S, T, rb, cb = lap.blocks.shape
        pl_, pr_ = lap.pad_left, lap.pad_right
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, V, C)), dt)
        w = jnp.asarray(rng.standard_normal((2, C, F)) * 0.1, dt)
        # pre-concatenated blocks: [T, rb, S*cb], constant transform of blocks
        blocks_cat = jnp.asarray(
            np.asarray(jax.device_get(lap.blocks)).transpose(1, 2, 0, 3).reshape(T, rb, S * cb),
            dt,
        )

        def apply_stacked(u, bc):
            """One batched GEMM: win[b,t,m,c] = xp[b,(t*cb)+m,c], m in [0,S*cb)."""
            xp = jnp.pad(u, ((0, 0), (pl_, pr_), (0, 0)))
            Cc = u.shape[-1]
            win = jnp.concatenate(
                [xp[:, k * cb : (k + T) * cb, :].reshape(B, T, cb, Cc) for k in range(S)],
                axis=2,
            )
            y = jnp.einsum(
                "tim,btmc->btic", bc.astype(u.dtype), win,
                preferred_element_type=u.dtype,
            )
            return y.reshape(B, T * rb, Cc)[:, :V, :]

        def conv_prod(x, lap, w):                       # production path
            return cheb_conv(x, lap, w)

        def conv_stacked(x, bc, w):                     # (a) apply-first, stacked GEMM
            lx = apply_stacked(x, bc)
            return jnp.einsum("bvc,cf->bvf", x, w[0]) + jnp.einsum(
                "bvc,cf->bvf", lx, w[1]
            )

        def conv_projfirst(x, lap, w):                  # (b) Clenshaw, prod apply
            u = jnp.einsum("bvc,cf->bvf", x, w[1], preferred_element_type=x.dtype)
            return jnp.einsum(
                "bvc,cf->bvf", x, w[0], preferred_element_type=x.dtype
            ) + lap(u)

        def conv_projfirst_stacked(x, bc, w):           # (a)+(b)
            u = jnp.einsum("bvc,cf->bvf", x, w[1], preferred_element_type=x.dtype)
            return jnp.einsum(
                "bvc,cf->bvf", x, w[0], preferred_element_type=x.dtype
            ) + apply_stacked(u, bc)

        variants = {
            "prod": (conv_prod, (lap, w)),
            "stacked": (conv_stacked, (blocks_cat, w)),
            "projfirst": (conv_projfirst, (lap, w)),
            "projfirst_stacked": (conv_projfirst_stacked, (blocks_cat, w)),
        }
        ref = None
        carrier = jnp.zeros_like(x)
        for name, (fn, extra) in variants.items():
            out = np.asarray(
                jax.device_get(jax.jit(fn)(x, *extra)), np.float32
            )
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9))
            assert err < 5e-2, (name, err)
            # chained via a carrier perturbing x; output fed back through sum
            # so shapes stay [B,V,C] regardless of F. x rides as an
            # argument — closing over it would inline it into the HLO
            # (CLAUDE.md: remote-compile upload 413 on large constants)
            g = jax.grad(
                lambda u, x_, *e, fn=fn: jnp.sum(fn(x_ + u, *e) ** 2)
            )
            fwd = _timed_chained(
                lambda u, x_, *e, fn=fn: u + 1e-12 * jnp.sum(fn(x_ + u, *e)),
                carrier, (x,) + extra,
            )
            fb = _timed_chained(
                lambda u, x_, *e, g=g: u - 1e-9 * g(u, x_, *e), carrier, (x,) + extra
            )
            print(json.dumps({
                "fuse": dtype_name, "B": B, "C": C, "F": F, "level": args.level,
                "S": int(S), "variant": name,
                "fwd_ms": round(fwd, 4), "fwdbwd_ms": round(fb, 4),
            }), flush=True)


def cmd_bmapply(args):
    """Bare band apply A/B: production XLA banded op vs the batch-major
    Pallas window kernel (v4) — fwd only, per-apply ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.ops.pallas.cheb_kernel import banded_apply_bm

    B, C = args.batch, args.channels
    for dtype_name in ("float32", "bfloat16") if args.dtype == "both" else (args.dtype,):
        dt = jnp.dtype(dtype_name)
        ctx = _flagship_ctx(dtype_name)
        lap = ctx.lap[args.level]
        V = lap.n_rows
        S = int(lap.blocks.shape[0])
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, V, C)), dt)

        def pallas_apply(x, blocks):
            return banded_apply_bm(x, blocks, lap.pad_left, lap.pad_right, V)

        ref = np.asarray(jax.device_get(jax.jit(lambda x, lap: lap(x))(x, lap)), np.float32)
        got = np.asarray(jax.device_get(jax.jit(pallas_apply)(x, lap.blocks)), np.float32)
        err = float(np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-9))
        assert err < 5e-2, err
        S_, T_, rb_, cb_ = lap.blocks.shape
        pl_, pr_ = lap.pad_left, lap.pad_right

        def apply_cf(xcf, blocks):
            """Channels-first [B, C, V]: vertex axis minor (full 128 lanes
            even at C=64, where [.., V, C] wastes half of every tile)."""
            xp = jnp.pad(xcf, ((0, 0), (0, 0), (pl_, pr_)))
            y = None
            for k in range(S_):
                view = xp[:, :, k * cb_ : k * cb_ + T_ * cb_].reshape(
                    B, C, T_, cb_
                )
                term = jnp.einsum(
                    "tij,bctj->bcti", blocks[k].astype(xcf.dtype), view,
                    preferred_element_type=xcf.dtype,
                )
                y = term if y is None else y + term
            return y.reshape(B, C, T_ * rb_)[:, :, :V]

        xcf = jnp.asarray(np.asarray(jax.device_get(x)).transpose(0, 2, 1), dt)
        ref_cf = np.asarray(
            jax.device_get(jax.jit(apply_cf)(xcf, lap.blocks)), np.float32
        ).transpose(0, 2, 1)
        err_cf = float(np.max(np.abs(ref - ref_cf)) / max(np.max(np.abs(ref)), 1e-9))
        assert err_cf < 5e-2, err_cf

        # sub-0.3ms ops need inner >> 128 to clear the ~29ms sync floor
        r = {
            "xla_ms": _timed_chained(lambda x, lap: lap(x), x, (lap,), inner=512),
            "pallas_bm_ms": _timed_chained(
                lambda x, b: pallas_apply(x, b), x, (lap.blocks,), inner=512
            ),
            "cf_ms": _timed_chained(
                lambda x, b: apply_cf(x, b), xcf, (lap.blocks,), inner=512
            ),
            "max_rel_err": err,
        }
        print(json.dumps({"bmapply": dtype_name, "B": B, "C": C,
                          "level": args.level, "S": S,
                          **{k: round(v, 4) for k, v in r.items()}}), flush=True)


def cmd_chain(args):
    """Cross-op layout A/B (round 5): N stacked Chebyshev convs
    (+bias+leakyReLU) with RESIDENT activations in (a) the production
    batch-major [B, V, C] layout vs (b) channels-first [B, C, V].

    Motivation: the round-5 per-fusion trace attribution pins ~1.4 ms of
    the 10.94 ms step on layout-conversion reshapes around the banded
    einsums (windows materialized cb-minor while activations live
    C-minor) plus ~0.67 ms of halo pad/slice fusions. The bare apply ties
    across layouts (bmapply), but a bare apply cannot see INTER-conv
    churn — this chain lets XLA lay out a whole conv stack per arm, so if
    the churn is avoidable by a model-wide resident-layout migration the
    cf arm must win here. Both arms stay padded-resident (no per-op
    natural-length slices), identical math, grads wrt input chained
    through the same layout.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.ops.cheb import cheb_conv

    B, C, K, N = args.batch, args.channels, args.k, args.depth
    for dtype_name in (
        ("float32", "bfloat16") if args.dtype == "both" else (args.dtype,)
    ):
        dt = jnp.dtype(dtype_name)
        ctx = _flagship_ctx(dtype_name, padded=True)
        lap = ctx.lap[args.level]
        S_, T_, rb_, cb_ = (int(s) for s in lap.blocks.shape)
        Vp = lap.p_cols
        pl_ = lap.pad_left
        halo_r = max((T_ + S_ - 1) * cb_ - pl_ - Vp, 0)
        rng = np.random.default_rng(0)
        ws = jnp.asarray(0.3 * rng.standard_normal((N, K, C, C)), dt)
        bs = jnp.asarray(0.1 * rng.standard_normal((N, C)), dt)
        x_bm = jnp.asarray(rng.standard_normal((B, Vp, C)), dt)

        def chain_bm(x, lap, ws, bs):
            for i in range(N):
                x = jax.nn.leaky_relu(cheb_conv(x, lap, ws[i]) + bs[i], 0.2)
            return x

        tpl_ = lap.t_pad_left
        t_halo_r = max((T_ + S_ - 1) * cb_ - tpl_ - Vp, 0)

        def _cf_raw(xcf, blocks, pad_l, pad_r):
            # padded-resident channels-first banded apply: halo pad on the
            # minor (vertex) axis, windows already cb-minor — no layout
            # conversion between consecutive convs by construction
            xp = jnp.pad(xcf, ((0, 0), (0, 0), (pad_l, pad_r)))
            y = None
            for k in range(S_):
                view = xp[:, :, k * cb_ : k * cb_ + T_ * cb_].reshape(
                    xcf.shape[0], xcf.shape[1], T_, cb_
                )
                term = jnp.einsum(
                    "tij,bctj->bcti", blocks[k].astype(xcf.dtype), view,
                    preferred_element_type=xcf.dtype,
                )
                y = term if y is None else y + term
            return y.reshape(xcf.shape[0], xcf.shape[1], T_ * rb_)

        def apply_cf(xcf, blocks):
            return _cf_raw(xcf, blocks, pl_, halo_r)

        # fair-backward variant: same hand-written transposed-apply VJP the
        # production BandedOp uses (ops/banded.py:66-87) instead of letting
        # autodiff differentiate through the pad/slice windows
        @jax.custom_vjp
        def cf_banded(xcf, blocks, t_blocks):
            return _cf_raw(xcf, blocks, pl_, halo_r)

        def _cf_fwd(xcf, blocks, t_blocks):
            return cf_banded(xcf, blocks, t_blocks), (blocks, t_blocks)

        def _cf_bwd(res, g):
            blocks, t_blocks = res
            dx = _cf_raw(g, t_blocks, tpl_, t_halo_r)
            return dx, jnp.zeros_like(blocks), jnp.zeros_like(t_blocks)

        cf_banded.defvjp(_cf_fwd, _cf_bwd)

        def cheb_cf(xcf, lapfn, w):
            xs = [xcf]
            if K > 1:
                xs.append(lapfn(xcf))
            for _ in range(2, K):
                xs.append(2.0 * lapfn(xs[-1]) - xs[-2])
            acc = None
            for k, xk in enumerate(xs):
                term = jnp.einsum(
                    "bcv,co->bov", xk, w[k].astype(xcf.dtype),
                    preferred_element_type=xcf.dtype,
                )
                acc = term if acc is None else acc + term
            return acc

        def chain_cf(xcf, blocks, ws, bs):
            for i in range(N):
                xcf = jax.nn.leaky_relu(
                    cheb_cf(xcf, lambda v: apply_cf(v, blocks), ws[i])
                    + bs[i][None, :, None],
                    0.2,
                )
            return xcf

        def chain_cf_vjp(xcf, blocks, t_blocks, ws, bs):
            for i in range(N):
                xcf = jax.nn.leaky_relu(
                    cheb_cf(xcf, lambda v: cf_banded(v, blocks, t_blocks), ws[i])
                    + bs[i][None, :, None],
                    0.2,
                )
            return xcf

        # same math check (padded tails excluded — garbage-tolerant rows)
        x_cf = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(jax.device_get(x_bm)).transpose(0, 2, 1)
            ),
            dt,
        )
        nat = lap.n_rows
        out_bm = np.asarray(
            jax.device_get(jax.jit(chain_bm)(x_bm, lap, ws, bs)), np.float32
        )[:, :nat]
        out_cf = np.asarray(
            jax.device_get(jax.jit(chain_cf)(x_cf, lap.blocks, ws, bs)),
            np.float32,
        ).transpose(0, 2, 1)[:, :nat]
        scale = max(float(np.max(np.abs(out_bm))), 1e-9)
        err = float(np.max(np.abs(out_bm - out_cf)) / scale)
        assert err < 5e-2, err

        # the custom-VJP arm computes the same forward
        out_cfv = np.asarray(
            jax.device_get(
                jax.jit(chain_cf_vjp)(x_cf, lap.blocks, lap.t_blocks, ws, bs)
            ),
            np.float32,
        ).transpose(0, 2, 1)[:, :nat]
        err_v = float(np.max(np.abs(out_bm - out_cfv)) / scale)
        assert err_v < 5e-2, err_v

        def bwd_bm(x, lap, ws, bs):
            return jax.grad(lambda xx: jnp.sum(chain_bm(xx, lap, ws, bs)))(x)

        def bwd_cf(xcf, blocks, ws, bs):
            return jax.grad(
                lambda xx: jnp.sum(chain_cf(xx, blocks, ws, bs))
            )(xcf)

        def bwd_cf_vjp(xcf, blocks, t_blocks, ws, bs):
            return jax.grad(
                lambda xx: jnp.sum(chain_cf_vjp(xx, blocks, t_blocks, ws, bs))
            )(xcf)

        inner = args.inner
        r = {
            "bm_fwd_ms": _timed_chained(chain_bm, x_bm, (lap, ws, bs), inner=inner),
            "cf_fwd_ms": _timed_chained(
                chain_cf, x_cf, (lap.blocks, ws, bs), inner=inner
            ),
            "bm_fwdbwd_ms": _timed_chained(
                bwd_bm, x_bm, (lap, ws, bs), inner=inner
            ),
            "cf_fwdbwd_ms": _timed_chained(
                bwd_cf, x_cf, (lap.blocks, ws, bs), inner=inner
            ),
            "cfv_fwdbwd_ms": _timed_chained(
                bwd_cf_vjp, x_cf, (lap.blocks, lap.t_blocks, ws, bs), inner=inner
            ),
            "max_rel_err": err,
        }
        print(
            json.dumps(
                {
                    "chain": dtype_name, "B": B, "C": C, "K": K, "depth": N,
                    "level": args.level,
                    **{k: round(v, 4) for k, v in r.items()},
                }
            ),
            flush=True,
        )


def cmd_parts(args):
    """Encoder / decoder / discriminator fwd vs fwd+bwd at flagship config."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.models.cape import CAPE

    cfg = CAPEConfig(
        name="perflab", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, batch_size=args.batch, compute_dtype=args.dtype,
    )
    ctx = _flagship_ctx(args.dtype)
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    rng = np.random.default_rng(0)
    B = args.batch
    x = jnp.asarray(rng.standard_normal((B, 6890, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, cfg.nz_cond)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((B, cfg.nz_cond2)), jnp.float32)
    zt = jnp.asarray(
        rng.standard_normal((B, cfg.nz + cfg.nz_cond + cfg.nz_cond2)), jnp.float32
    )

    # per-part losses as functions of a chained carrier u: the carrier
    # perturbs the data input so every inner iteration must recompute
    parts = {
        "enc": lambda u, p, c: jnp.sum(
            model.encode(p, c, x + u, y, y2)[0] ** 2
        ),
        "dec": lambda u, p, c: jnp.sum(
            model.decode(p, c, zt + jnp.sum(u) * 1e-9, y, y2) ** 2
        ),
        "disc": lambda u, p, c: jnp.sum(
            model.discriminate(p, c, x + u, y, y2) ** 2
        ),
    }
    u0 = jnp.zeros_like(x)
    out = {}
    for name, loss in parts.items():
        g = jax.grad(loss)
        f = _timed_chained(
            lambda u, p, c, loss=loss: u + 1e-9 * loss(u, p, c), u0, (params, ctx)
        )
        b = _timed_chained(
            lambda u, p, c, g=g: u - 1e-6 * g(u, p, c), u0, (params, ctx)
        )
        out[name] = {"fwd_ms": round(f, 3), "fwdbwd_ms": round(b, 3),
                     "ratio": round(b / f, 2)}
        print(json.dumps({"part": name, "dtype": args.dtype, **out[name]}), flush=True)
    return out


def cmd_step(args):
    """Full GAN train step (the bench workload) at a given dtype/batch,
    through the production scanned-dispatch path (K steps per dispatch,
    device-resident data, one sync fetch per dispatch — the old
    step-by-step protocol built an 8-deep host queue that the relay
    handles pathologically once steps exceed ~100 ms)."""
    import jax
    import numpy as np

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.loader import BatchStream
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.models.cape import CAPE
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_multi_train_step

    cfg = CAPEConfig(
        name="perflab_step", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, lambda_edge=1.0, batch_size=args.batch,
        compute_dtype=args.dtype, padded_layout=bool(args.padded),
        remat=bool(args.remat), fuse_decoder=bool(args.fuse),
    )
    ctx = _flagship_ctx(
        args.dtype, padded=cfg.padded_layout, build_fused=cfg.fuse_decoder
    )
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)
    multi_fn = jax.jit(build_multi_train_step(model, cfg, tx), donate_argnums=(0,))

    n_train = max(256, 2 * args.batch)
    data = synthetic_bodydata(n_train=n_train + 64, n_test=8, num_verts=6890, seed=0)
    dev_data = {
        "disp": jax.numpy.asarray(data.disp_train),
        "pose": jax.numpy.asarray(data.pose_train),
        "clo": jax.numpy.asarray(data.clo_train),
    }
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)
    K = args.k

    def chunk(k):
        ig = np.stack([sg.next_indices() for _ in range(k)]).astype(np.int32)
        idd = np.stack([sd.next_indices() for _ in range(k)]).astype(np.int32)
        return jax.numpy.asarray(ig), jax.numpy.asarray(idd)

    state = create_train_state(params, tx)
    rng = jax.random.PRNGKey(0)

    import time as _t

    ig, idd = chunk(K)
    state, metrics = multi_fn(state, ctx, dev_data, ig, idd, rng)
    jax.device_get(metrics["loss_g"])
    times = []
    for g in range(6):
        ig, idd = chunk(K)
        t0 = _t.perf_counter()
        state, metrics = multi_fn(state, ctx, dev_data, ig, idd, rng)
        jax.device_get(metrics["loss_g"])
        times.append((_t.perf_counter() - t0) / K)
    times.sort()
    ms = 1000.0 * times[len(times) // 2]
    m = {k: float(v[-1]) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), m
    print(json.dumps({
        "step_ms": round(ms, 2), "steps_per_sec": round(1000.0 / ms, 1),
        "dtype": args.dtype, "batch": args.batch, "steps_per_dispatch": K,
        "padded": bool(args.padded), "fuse_decoder": bool(args.fuse),
    }), flush=True)


def cmd_serve(args):
    """Serving-side benchmarks on the flagship config: generation (decode)
    latency and reconstruction (encode+decode) throughput, batch 1/16/64.

    The reference has no serving path at all (inference re-enters the TF1
    session loop, lib/models.py:931-1174); these are the numbers a
    deployment actually cares about. Protocol: chained fori_loop per-op
    timings (relay floor note on _timed_chained) plus one honest
    dispatch-inclusive single-call latency — for a remote client the
    dispatch+sync round-trip IS part of serving latency.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.models.cape import CAPE

    dtype = args.dtype
    cfg = CAPEConfig(
        name="perflab_serve", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, compute_dtype=dtype, padded_layout=bool(args.padded),
    )
    ctx = _flagship_ctx(dtype, padded=cfg.padded_layout)
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    # n_train covers the largest batch AFTER the default val carve-out
    data = synthetic_bodydata(n_train=160, n_test=8, num_verts=6890, seed=0)
    perm = ctx.vertex_perm

    def gen_step(z, y, y2, p, c):
        out = model.decode(p, c, jnp.concatenate([z, y, y2], axis=-1), y, y2)
        # data dependence that cannot be elided; the added full-reduction
        # is negligible against the decode
        return z + (jnp.sum(out) * 1e-30).astype(z.dtype)

    def recon_step(x, y, y2, p, c):
        z_mean, _ = model.encode(p, c, x, y, y2)
        zt = jnp.concatenate([z_mean, y, y2], axis=-1)
        return model.decode(p, c, zt, y, y2).astype(x.dtype)

    emb = jax.jit(model.embed_conditions)
    dec = jax.jit(model.decode)
    rng = np.random.default_rng(0)
    for B in (1, 16, 64):
        disp = data.disp_train[:B] if perm is None else data.disp_train[:B][:, perm]
        x = jnp.asarray(disp, jnp.float32)
        y, y2 = emb(params, jnp.asarray(data.pose_train[:B]), jnp.asarray(data.clo_train[:B]))
        z = jnp.asarray(rng.standard_normal((B, cfg.nz)), jnp.float32)

        decode_ms = _timed_chained(gen_step, z, (y, y2, params, ctx), inner=args.inner)
        recon_ms = _timed_chained(recon_step, x, (y, y2, params, ctx), inner=args.inner)

        # dispatch-inclusive single-call decode latency (remote serving)
        zt = jnp.concatenate([z, y, y2], axis=-1)
        for _ in range(3):
            out = dec(params, ctx, zt, y, y2)
        jax.device_get(jnp.sum(out))
        lats = []
        for _ in range(16):
            t0 = time.perf_counter()
            out = dec(params, ctx, zt, y, y2)
            jax.device_get(jnp.sum(out))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        call_ms = 1000.0 * lats[len(lats) // 2]

        print(json.dumps({
            "bench": "serve", "batch": B, "dtype": dtype,
            "padded": bool(args.padded), "inner": args.inner,
            "decode_ms_per_call": round(decode_ms, 3),
            "decode_meshes_per_sec": round(B / (decode_ms / 1000.0), 1),
            "reconstruct_ms_per_call": round(recon_ms, 3),
            "reconstruct_samples_per_sec": round(B / (recon_ms / 1000.0), 1),
            "single_call_decode_ms_incl_dispatch": round(call_ms, 3),
        }), flush=True)


def cmd_trace(args):
    """Capture a profiler trace of the full train step and print device-time
    attribution: by HLO category and by framework source line. This is how
    the 12 ms step was decomposed (docs/PERF.md 'Where a step goes')."""
    import collections
    import glob
    import gzip
    import re
    import tempfile

    import jax
    import numpy as np

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.loader import BatchStream
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.models.cape import CAPE
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_resident_train_step

    n_steps = 4
    cfg = CAPEConfig(
        name="perflab_trace", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, lambda_edge=1.0, batch_size=args.batch,
        compute_dtype=args.dtype, padded_layout=bool(args.padded),
    )
    ctx = _flagship_ctx(args.dtype, padded=cfg.padded_layout)
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)
    step_fn = jax.jit(build_resident_train_step(model, cfg, tx), donate_argnums=(0,))

    data = synthetic_bodydata(
        n_train=max(256, 2 * args.batch) + 64, n_test=8, num_verts=6890, seed=0
    )
    dev_data = {
        "disp": jax.numpy.asarray(data.disp_train),
        "pose": jax.numpy.asarray(data.pose_train),
        "clo": jax.numpy.asarray(data.clo_train),
    }
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)

    def idx():
        return (
            jax.numpy.asarray(sg.next_indices().astype(np.int32)),
            jax.numpy.asarray(sd.next_indices().astype(np.int32)),
        )

    state = create_train_state(params, tx)
    rng = jax.random.PRNGKey(0)
    for i in range(3):
        ig, idd = idx()
        state, metrics = step_fn(state, ctx, dev_data, ig, idd, jax.random.fold_in(rng, i))
    jax.device_get(metrics["loss_g"])

    log_dir = args.out or tempfile.mkdtemp(prefix="cape_trace_")
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        for i in range(n_steps):
            ig, idd = idx()
            state, metrics = step_fn(
                state, ctx, dev_data, ig, idd, jax.random.fold_in(rng, 10 + i)
            )
        jax.device_get(metrics["loss_g"])

    traces = sorted(glob.glob(f"{log_dir}/**/perfetto_trace.json.gz", recursive=True))
    if not traces:
        print(json.dumps({"error": "no trace produced (backend may not support tracing)"}))
        return
    with gzip.open(traces[-1]) as f:
        payload = json.load(f)
    events = payload if isinstance(payload, list) else payload.get("traceEvents", [])
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e["name"] == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"]["name"]
    by_src: collections.Counter = collections.Counter()
    by_cat: collections.Counter = collections.Counter()
    n_src: collections.Counter = collections.Counter()
    # per-fusion-family attribution (round 5): group by (stripped op name,
    # category, source) keeping a sample shape — this is the level at
    # which the 4.6 ms non-MXU residue becomes legible (merge-reshape
    # layout conversions, halo pad_slice fusions, async DMA waits)
    fam: dict = {}
    cat_bytes: collections.Counter = collections.Counter()
    cat_flops: collections.Counter = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if thread_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args") or {}
        d = e.get("dur", 0)
        total += d
        src = re.sub(r"^/root/repo/", "", a.get("source", "?"))
        by_src[src] += d
        n_src[src] += 1
        cat = a.get("hlo_category", "?")
        by_cat[cat] += d
        cat_bytes[cat] += float(a.get("bytes_accessed", 0) or 0)
        cat_flops[cat] += float(a.get("model_flops", 0) or 0)
        key = (re.sub(r"[.\d]+$", "", e["name"]), cat, src)
        rec = fam.setdefault(key, [0.0, 0, ""])
        rec[0] += d
        rec[1] += 1
        if not rec[2]:
            rec[2] = (a.get("shape_with_layout") or "")[:48]
    print(json.dumps({
        "device_ms_per_step": round(total / (1000 * n_steps), 2),
        "batch": args.batch, "dtype": args.dtype, "trace_dir": log_dir,
    }), flush=True)
    print("# by hlo category (us/step | achieved GB/s, TFLOP/s from "
          "bytes_accessed/model_flops — counts re-reads, not pure HBM):")
    for k, v in by_cat.most_common(10):
        us = v / n_steps
        gbs = (cat_bytes[k] / n_steps) / max(us * 1e-6, 1e-12) / 1e9
        tfs = (cat_flops[k] / n_steps) / max(us * 1e-6, 1e-12) / 1e12
        print(f"#  {us:9.1f}  {k:24s} {gbs:7.0f} GB/s {tfs:7.2f} TF/s")
    print("# by source line (us/step, count/step):")
    for k, v in by_src.most_common(args.top):
        print(f"#  {v/n_steps:9.1f} {n_src[k]//n_steps:5d}  {k}")
    print("# by fusion family (us/step, count/step, name, category, source, shape):")
    for (name, cat, src), (d, c, shp) in sorted(
        fam.items(), key=lambda kv: -kv[1][0]
    )[: args.top]:
        print(
            f"#  {d/n_steps:9.1f} {c//n_steps:5d}  {name:24.24s} "
            f"{cat:18.18s} {src.split('/')[-1]:18.18s} {shp}"
        )


def cmd_http(args):
    """End-to-end serving latency through the HTTP stack against a LIVE
    server (start one with `python -m cape_tpu.apps.server ...`). This is
    what a remote client sees: JSON encode + socket + device work + JSON
    decode — the delta vs `serve`'s dispatch-inclusive device latency is
    the server-stack overhead. Prints client-side p50/p95 per endpoint
    and the server's own /stats quantiles for cross-checking."""
    import time

    import numpy as np

    from cape_tpu.apps.client import CapeClient

    wires = ("npz", "json") if args.wire == "both" else (args.wire,)
    probe = CapeClient(args.url)
    h = probe.health()
    print(f"# target {args.url}: model={h['model']} batch={h['batch_size']} "
          f"dtype={h['compute_dtype']}")
    rng = np.random.default_rng(0)
    pose = np.zeros((1, h["cond_dim"]), np.float32)
    clo = np.zeros((1, h["cond2_dim"]), np.float32)
    disp = (rng.standard_normal((args.batch, h["num_verts"], 3)) * 0.01).astype(np.float32)
    pose_b = np.repeat(pose, args.batch, 0)
    clo_b = np.repeat(clo, args.batch, 0)

    def bench(label, fn):
        for _ in range(3):
            fn()
        lats = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            lats.append(1000.0 * (time.perf_counter() - t0))
        lats.sort()
        q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))]
        print(f"#  {label:<34} p50 {q(0.50):8.2f} ms  p95 {q(0.95):8.2f} ms  "
              f"({args.batch / (q(0.50) / 1000.0):8.1f} mesh/s at p50)")

    for wire in wires:
        c = CapeClient(args.url, wire=wire)
        bench(f"[{wire}] sample n={args.batch}",
              lambda: c.sample(pose, clo, n=args.batch, seed=1))
        bench(f"[{wire}] reconstruct batch={args.batch}",
              lambda: c.reconstruct(disp, pose_b, clo_b))
    print("# server-side /stats (device work + parse, excl. socket+client):")
    for ep, s in probe.stats().items():
        print(f"#  {ep:<20} n={s['requests']:<5} p50 {s['latency_ms_p50']} ms "
              f"p95 {s['latency_ms_p95']} ms")


def cmd_artifact(args):
    """Decode latency of an exported .capex artifact on the attached
    backend, chained-loop protocol as in `serve`. Primary use: A/B a
    compressed export (export_model --quantize int8 --constants-dtype
    bfloat16) against its uncompressed twin — the int8/bf16 tables are
    what HBM reads at serving time.

    Relay caveat: an artifact's constants (params + banded blocks) are
    PART of its program, so compiling it through the remote-attach relay
    uploads them all — a large f32 artifact can exceed the relay's
    request limit (HTTP 413, CLAUDE.md). That is inherent to artifact
    serving through a relay, not to this bench; artifact deployments
    target locally attached hosts (compressed exports are ~3.5x smaller
    and may fit where the f32 twin does not)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cape_tpu.tools.export_model import ExportedModel

    em = ExportedModel.load(args.path)
    m = em.meta
    if args.batch and not m.get("symbolic_batch"):
        raise SystemExit(
            f"--batch {args.batch} has no effect: {args.path} is a "
            f"fixed-batch artifact (batch_size={m['batch_size']}); only "
            "--symbolic-batch exports run at other sizes"
        )
    B = args.batch or m["batch_size"]
    rng = np.random.default_rng(0)
    zt = jnp.asarray(
        rng.standard_normal((B, m["nz"] + m["nz_cond"] + m["nz_cond2"])), jnp.float32
    )
    y = jnp.asarray(rng.standard_normal((B, m["nz_cond"])), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((B, m["nz_cond2"])), jnp.float32)
    call = em._calls["decode"]

    def step(z, y, y2):
        out = call(z, y, y2)
        # non-elidable data dependence, negligible added cost (cmd_serve)
        return z + (jnp.sum(out) * 1e-30).astype(z.dtype)

    ms = _timed_chained(step, zt, (y, y2), inner=args.inner)
    for _ in range(3):
        out = call(zt, y, y2)
    jax.device_get(np.asarray(jnp.sum(out)))
    lats = []
    for _ in range(16):
        t0 = time.perf_counter()
        out = call(zt, y, y2)
        jax.device_get(jnp.sum(out))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(json.dumps({
        "bench": "artifact", "path": args.path, "batch": B,
        "quantize": m.get("quantize"), "constants_dtype": m.get("constants_dtype"),
        "inner": args.inner,
        "decode_ms_per_call": round(ms, 3),
        "decode_meshes_per_sec": round(B / (ms / 1000.0), 1),
        "single_call_decode_ms_incl_dispatch": round(
            1000.0 * lats[len(lats) // 2], 3
        ),
    }), flush=True)


def cmd_concurrency(args):
    """Aggregate serving throughput under concurrent load against a LIVE
    server: --threads clients each issue /sample requests (--rows meshes
    per request) for --seconds. Reports req/s, mesh/s, client latency
    quantiles, and the server's micro-batch coalescing delta. A/B: run
    against a default server, then one started with --no-micro-batch."""
    import concurrent.futures

    import numpy as np

    from cape_tpu.apps.client import CapeClient

    probe = CapeClient(args.url)
    h = probe.health()
    print(f"# target {args.url}: model={h['model']} batch={h['batch_size']} "
          f"dtype={h['compute_dtype']} threads={args.threads} rows={args.rows}")
    pose = np.zeros((1, h["cond_dim"]), np.float32)
    clo = np.zeros((1, h["cond2_dim"]), np.float32)
    probe.sample(pose, clo, n=args.rows, seed=0)  # compile warmup
    mb0 = probe.stats().get("(micro_batch)")

    stop_at = time.monotonic() + args.seconds

    def worker(i):
        c = CapeClient(args.url)
        lats, errors = [], 0
        while time.monotonic() < stop_at:
            t0 = time.perf_counter()
            try:
                c.sample(pose, clo, n=args.rows, seed=i)
            except Exception:
                errors += 1  # a load bench keeps partial results on failures
                continue
            lats.append(1000.0 * (time.perf_counter() - t0))
        return lats, errors

    t_start = time.monotonic()
    with concurrent.futures.ThreadPoolExecutor(args.threads) as ex:
        results = list(ex.map(worker, range(args.threads)))
    elapsed = max(time.monotonic() - t_start, 1e-9)
    all_lats = sorted(v for lats, _ in results for v in lats)
    n_err = sum(e for _, e in results)
    if not all_lats:
        raise SystemExit(f"no request completed ({n_err} errors) — is the server up?")
    q = lambda p: all_lats[min(len(all_lats) - 1, int(p * len(all_lats)))]
    out = {
        "bench": "concurrency", "threads": args.threads, "rows": args.rows,
        "seconds": round(elapsed, 1), "requests": len(all_lats), "errors": n_err,
        "req_per_sec": round(len(all_lats) / elapsed, 1),
        "meshes_per_sec": round(len(all_lats) * args.rows / elapsed, 1),
        "latency_ms_p50": round(q(0.50), 2), "latency_ms_p95": round(q(0.95), 2),
    }
    mb1 = probe.stats().get("(micro_batch)")
    if mb0 and mb1:
        dreq = mb1["decode_requests"] - mb0["decode_requests"]
        dcall = mb1["decode_calls"] - mb0["decode_calls"]
        out["decode_requests_per_device_call"] = round(dreq / max(1, dcall), 2)
    print(json.dumps(out), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("conv")
    pc.add_argument("--batch", type=int, default=16)
    pc.add_argument("--channels", type=int, default=64)
    pc.add_argument("--level", type=int, default=0)
    pc.add_argument("--padded", type=int, default=0)
    pl = sub.add_parser("layout")
    pl.add_argument("--batch", type=int, default=16)
    pl.add_argument("--channels", type=int, default=64)
    pf = sub.add_parser("fuse")
    pf.add_argument("--batch", type=int, default=16)
    pf.add_argument("--channels", type=int, default=64)
    pf.add_argument("--fout", type=int, default=None)
    pf.add_argument("--level", type=int, default=0)
    pf.add_argument("--dtype", default="both")
    pb = sub.add_parser("bmapply")
    pb.add_argument("--batch", type=int, default=16)
    pb.add_argument("--channels", type=int, default=64)
    pb.add_argument("--level", type=int, default=0)
    pb.add_argument("--dtype", default="bfloat16")
    pch = sub.add_parser("chain")
    pch.add_argument("--batch", type=int, default=16)
    pch.add_argument("--channels", type=int, default=64)
    pch.add_argument("--k", type=int, default=2)
    pch.add_argument("--depth", type=int, default=4)
    pch.add_argument("--level", type=int, default=0)
    pch.add_argument("--dtype", default="bfloat16")
    pch.add_argument("--inner", type=int, default=128)
    pp = sub.add_parser("parts")
    pp.add_argument("--batch", type=int, default=16)
    pp.add_argument("--dtype", default="float32")
    ps = sub.add_parser("step")
    ps.add_argument("--batch", type=int, default=16)
    ps.add_argument("--dtype", default="float32")
    ps.add_argument("--k", type=int, default=8, help="steps per dispatch")
    ps.add_argument("--padded", type=int, default=0, help="persistent-padded layout")
    ps.add_argument("--remat", type=int, default=0, help="jax.checkpoint each block")
    ps.add_argument("--fuse", type=int, default=0, help="fused decoder unpool (cfg.fuse_decoder)")
    pt = sub.add_parser("trace")
    pt.add_argument("--batch", type=int, default=16)
    pt.add_argument("--dtype", default="bfloat16")
    pt.add_argument("--out", default=None, help="trace output dir")
    pt.add_argument("--top", type=int, default=20)
    pt.add_argument("--padded", type=int, default=0, help="persistent-padded layout")
    pv = sub.add_parser("serve")
    pv.add_argument("--dtype", default="bfloat16")
    pv.add_argument("--padded", type=int, default=1, help="persistent-padded layout")
    pv.add_argument("--inner", type=int, default=128)
    ph = sub.add_parser("http")
    ph.add_argument("--url", default="http://127.0.0.1:8080")
    ph.add_argument("--batch", type=int, default=16)
    ph.add_argument("--reps", type=int, default=50)
    ph.add_argument("--wire", default="both", choices=("both", "npz", "json"))
    pa = sub.add_parser("artifact")
    pa.add_argument("path", help=".capex artifact to time")
    pa.add_argument("--batch", type=int, default=None,
                    help="batch size (symbolic-batch artifacts only)")
    pa.add_argument("--inner", type=int, default=128)
    pn = sub.add_parser("concurrency")
    pn.add_argument("--url", default="http://127.0.0.1:8080")
    pn.add_argument("--threads", type=int, default=16)
    pn.add_argument("--rows", type=int, default=1, help="meshes per request")
    pn.add_argument("--seconds", type=float, default=20.0)
    args = p.parse_args(argv)
    # Persistent compile cache (same as bench.py): remote compiles through
    # the relay run 30-300+ s; A/B protocols re-invoke this CLI per arm and
    # must not pay them twice. Measured timings are device-time only and
    # unaffected by where the executable came from.
    import os

    import jax

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    {"conv": cmd_conv, "layout": cmd_layout, "parts": cmd_parts,
     "fuse": cmd_fuse, "bmapply": cmd_bmapply, "step": cmd_step,
     "trace": cmd_trace, "serve": cmd_serve, "http": cmd_http,
     "artifact": cmd_artifact, "concurrency": cmd_concurrency,
     "chain": cmd_chain}[args.cmd](args)


if __name__ == "__main__":
    main()

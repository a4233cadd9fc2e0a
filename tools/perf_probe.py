"""Component-level timing of the flagship distill step on the attached chip.

Times each piece of the KA-distill step (teacher fwd, student fwd/bwd,
D update, G head, Adam updates) as separately-jitted functions, plus the
full fused step, so the step-time budget can be attributed.  Also runs
micro conv benchmarks for the block's characteristic shapes to guide
restructuring decisions (branch merging, channel padding).

Usage:
  python tools/perf_probe.py step        # component timing of the train step
  python tools/perf_probe.py convs       # micro conv shape benchmarks
  python tools/perf_probe.py peak        # bf16 matmul peak (MFU denominator)

Writes one JSON line per measurement to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SIZE = 256
BATCH = 128


@jax.jit
def _scalar_probe(tree):
    """Reduce an output pytree to one scalar (device sync via float())."""
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(tree)]
    return sum(leaves[:1])  # first leaf is enough to serialise the chain


def timed(fn, *args, iters=10, warmup=2, name=""):
    # block_until_ready is unreliable over the axon tunnel for non-scalar
    # futures (see bench.py) — sync by pulling one scalar to host instead.
    for _ in range(warmup):
        out = fn(*args)
    float(_scalar_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(_scalar_probe(out))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def build(fused=False, compute_dtype="bfloat16"):
    import os

    os.environ.setdefault("BENCH_DTYPE", compute_dtype)
    import bench

    bench.COMPUTE_DTYPE = compute_dtype
    dist, state, tv, res = bench.build()
    if fused:
        from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller
        import dataclasses

        hp = dataclasses.replace(dist.hp, fused_norms=True)
        dist = InceptionDistiller(dist.teacher_cfg, dist.student_cfg, dist.disc_cfg, hp)
    return dist, state, tv, res


def probe_step(fused=False):
    dist, state, tv, res = build(fused=fused)
    rng = jax.random.PRNGKey(1)
    batch = {
        "A": jax.random.normal(rng, (BATCH, SIZE, SIZE, 3), jnp.float32),
        "B": jax.random.normal(jax.random.fold_in(rng, 1), (BATCH, SIZE, SIZE, 3), jnp.float32),
    }
    tag = "fused" if fused else "plain"

    # full step (train_step donates its state: rebind every call)
    box = [state]

    def full():
        s, m = dist.train_step(box[0], tv, batch, 2e-4)
        box[0] = s
        return m["G_loss/recon"]

    timed(full, name=f"full_step/{tag}")
    state = box[0]

    from cat_tpu.train.common import apply_net, cast_floats

    cdt = jnp.dtype(dist.hp.compute_dtype)
    taps = dist.hp.mapping_layers
    down = lambda t: cast_floats(t, cdt)

    @jax.jit
    def teacher_fwd(tv, xa):
        (t_fake, t_acts), _ = apply_net(
            dist.netG_teacher, down(tv["params"]), tv.get("batch_stats", {}),
            down(xa), train=False, taps=taps,
        )
        return t_fake

    timed(teacher_fwd, tv, batch["A"], name=f"teacher_fwd/{tag}")

    @jax.jit
    def student_fwd(params, stats, xa):
        (fake, acts), _ = apply_net(
            dist.netG_student, down(params), stats, down(xa),
            train=True, mutable_stats=True, taps=taps,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return fake

    timed(student_fwd, state.g.params["G"], state.g.stats, batch["A"],
          name=f"student_fwd/{tag}")

    @jax.jit
    def student_fwd_bwd(params, stats, xa):
        def f(p):
            (fake, acts), _ = apply_net(
                dist.netG_student, down(p), stats, down(xa),
                train=True, mutable_stats=True, taps=taps,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jnp.sum(fake.astype(jnp.float32)) + sum(
                jnp.sum(a.astype(jnp.float32)) for a in acts.values()
            )

        return jax.grad(f)(params)

    timed(student_fwd_bwd, state.g.params["G"], state.g.stats, batch["A"],
          name=f"student_fwd_bwd/{tag}")

    from cat_tpu.models.losses import gan_loss

    @jax.jit
    def d_update(d_params, stats, fake, real):
        def d_loss_fn(p):
            pf, d1 = apply_net(dist.netD, down(p), stats, down(fake), train=True,
                               mutable_stats=True)
            pr, d2 = apply_net(dist.netD, down(p), d1, down(real), train=True,
                               mutable_stats=True)
            return 0.5 * (
                gan_loss(pf.astype(jnp.float32), False, dist.hp.gan_mode, True)
                + gan_loss(pr.astype(jnp.float32), True, dist.hp.gan_mode, True)
            )

        return jax.grad(d_loss_fn)(d_params)

    timed(d_update, state.d.params, state.d.stats, batch["A"], batch["B"],
          name=f"d_fwd_bwd/{tag}")

    from cat_tpu.distill.ka import ka

    hb, wb = SIZE // 4, SIZE // 4
    tb = dist.teacher_cfg.bottleneck
    sb = dist.student_cfg.bottleneck
    sa = jax.random.normal(rng, (BATCH, hb, wb, sb))
    ta = jax.random.normal(rng, (BATCH, hb, wb, tb))

    @jax.jit
    def ka_loss_grad(sa, ta):
        return jax.grad(lambda s: -ka(s, ta))(sa)

    timed(ka_loss_grad, sa, ta, name=f"ka_grad_x4/{tag}", iters=4)


def _slope(make_fn, reps=(2, 8), iters=6, name=""):
    """Per-op cost via the slope between rep counts (cancels dispatch cost).

    ``make_fn(n)`` must return a zero-arg jitted callable executing the op n
    times with a data dependency between repetitions.
    """
    times = {}
    for n in reps:
        fn = make_fn(n)
        for _ in range(2):
            out = fn()
        float(_scalar_probe(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(_scalar_probe(out))
        times[n] = (time.perf_counter() - t0) / iters
    per_op = (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0])
    print(json.dumps({"name": name, "ms": round(per_op * 1e3, 3)}), flush=True)
    return per_op


def probe_convs():
    """Characteristic conv shapes of the teacher block at 64x64.

    Each op repeats n times inside ONE jit (chained through a cheap scalar
    perturbation of the input so XLA cannot CSE the repetitions), and the
    per-op cost is the slope between n=2 and n=8 — single-dispatch timings
    over the axon tunnel carry ~3ms of fixed overhead.
    """
    B, H, W = BATCH, 64, 64
    shapes = [
        # (name, cin, cout, k)
        ("res_in_k5 256->42", 256, 42, 5),
        ("res_in_k3 256->42", 256, 42, 3),
        ("res_in_k1 256->42", 256, 42, 1),
        ("merged_in_k5 256->126", 256, 126, 5),
        ("merged_in_k5 256->252", 256, 252, 5),
        ("res_out_k5 42->256", 42, 256, 5),
        ("res_out_k3 42->256", 42, 256, 3),
        ("res_out_k1 42->256", 42, 256, 1),
        ("merged_out_k5 126->256", 126, 256, 5),
        ("merged_out_k1 168->256", 168, 256, 1),
        ("wide_k5 256->256", 256, 256, 5),
    ]
    for name, cin, cout, k in shapes:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout), jnp.bfloat16)
        w = w * (0.01 / (k * k * cin) ** 0.5)

        def make(n, x0=x0, w=w):
            @jax.jit
            def inner(x0, w):
                def body(i, carry):
                    x, acc = carry
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    s = jnp.sum(y[:1, :1, :1, :1])  # tiny dependency scalar
                    return (x * (1 + 0 * s.astype(x.dtype)), acc + s)

                _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.zeros((), jnp.bfloat16)))
                return acc

            return lambda: inner(x0, w)

        dt = _slope(make, name=f"conv/{name}")
        flops = 2 * B * H * W * cin * cout * k * k
        print(json.dumps({"name": f"conv/{name}", "tflops": round(flops / dt / 1e12, 1)}),
              flush=True)

    # instance-norm / elementwise cost on characteristic tensors
    for name, c, op in [
        ("inorm 42ch", 42, "inorm"),
        ("inorm 256ch", 256, "inorm"),
        ("relu 256ch", 256, "relu"),
        ("inorm_bf16arith 256ch", 256, "inorm16"),
    ]:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, c), jnp.bfloat16)

        def make(n, x0=x0, op=op):
            @jax.jit
            def inner(x0):
                def body(i, x):
                    if op == "relu":
                        return jax.nn.relu(x + jnp.bfloat16(1e-3))
                    if op == "inorm16":
                        m = jnp.mean(x, axis=(1, 2), keepdims=True)
                        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True).astype(
                            jnp.bfloat16
                        ) - jnp.square(m)
                        return jax.nn.relu((x - m) * jax.lax.rsqrt(v + 1e-5))
                    xf = x.astype(jnp.float32)
                    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
                    v = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(m)
                    return jax.nn.relu((xf - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

                return jnp.sum(jax.lax.fori_loop(0, n, body, x0)[:1, :1, :1, :1])

            return lambda: inner(x0)

        _slope(make, name=f"ew/{name}")


def probe_peak():
    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    dt = timed(mm, a, b, name="peak/bf16_matmul_8k")
    print(json.dumps({"name": "peak/bf16_tflops", "tflops": round(2 * n**3 / dt / 1e12, 1)}),
          flush=True)




# ---------------------------------------------------------------------------
# Block-level: current multi-branch block vs branch-packed prototype
# ---------------------------------------------------------------------------


def _center_pad_kernel(w, k):
    """Zero-pad an (kh,kw,ci,co) kernel to (k,k,ci,co), centred.

    A centred zero-padded kernel applied VALID over pad(x, (k-1)//2) computes
    exactly the original conv (for any spatial padding mode: the interior of
    a reflect/edge pad of width p contains the pad of width p-d).
    """
    kh = w.shape[0]
    d = (k - kh) // 2
    if d == 0:
        return w
    return jnp.pad(w, ((d, d), (d, d), (0, 0), (0, 0)))


def make_packed_apply(block_cfg, norm_eps=1e-5, padding_type="reflect"):
    """Branch-packed forward identical in math to InceptionBlock.__call__.

    Packs all branch "in" convs (res k-convs + dw 1x1s) into ONE conv, all
    first norms into one instance norm over the concat, the dw depthwise
    stage into one grouped conv, and all branch "out" convs into one conv
    whose result is already the branch sum.
    """
    res = list(block_cfg.active_res)
    dw = list(block_cfg.active_dw)
    kmax_in = max([k for _, _, k in res] + [1])
    kmax_dw = max([k for _, _, k in dw] + [1])
    kmax_out = kmax_in

    def apply(params, x, dtype=jnp.bfloat16):
        def P(name):
            return params[name]

        # ---- pack IN conv: [res mids | dw mids] ----
        win, bin_, nsc, nbi = [], [], [], []
        for i, mid, k in res:
            win.append(_center_pad_kernel(P(f"res{i}_in")["conv"]["kernel"], kmax_in))
            bin_.append(P(f"res{i}_in")["conv"]["bias"])
            nsc.append(P(f"res{i}_in")["norm"]["scale"])
            nbi.append(P(f"res{i}_in")["norm"]["bias"])
        for i, mid, k in dw:
            win.append(_center_pad_kernel(P(f"dw{i}_in")["conv"]["kernel"], kmax_in))
            bin_.append(P(f"dw{i}_in")["conv"]["bias"])
            nsc.append(P(f"dw{i}_in")["norm"]["scale"])
            nbi.append(P(f"dw{i}_in")["norm"]["bias"])
        Win = jnp.concatenate(win, axis=-1).astype(dtype)
        Bin = jnp.concatenate(bin_, axis=-1).astype(dtype)
        Nsc = jnp.concatenate(nsc, axis=-1)
        Nbi = jnp.concatenate(nbi, axis=-1)

        from cat_tpu.ops.nn import spatial_pad

        p = (kmax_in - 1) // 2
        u = jax.lax.conv_general_dilated(
            spatial_pad(x, p, padding_type), Win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + Bin

        # one instance norm + relu over the packed channels
        uf = u.astype(jnp.float32)
        m = jnp.mean(uf, axis=(1, 2), keepdims=True)
        v = jnp.mean(jnp.square(uf), axis=(1, 2), keepdims=True) - jnp.square(m)
        u = jax.nn.relu((uf - m) * jax.lax.rsqrt(v + norm_eps) * Nsc + Nbi).astype(dtype)

        n_res = sum(mid for _, mid, _ in res)
        h_res, g_dw = u[..., :n_res], u[..., n_res:]

        # ---- dw depthwise stage packed over channels ----
        if dw:
            wdw, bdw, dsc, dbi = [], [], [], []
            for i, mid, k in dw:
                wdw.append(_center_pad_kernel(P(f"dw{i}_mid")["conv"]["kernel"], kmax_dw))
                bdw.append(P(f"dw{i}_mid")["conv"]["bias"])
                dsc.append(P(f"dw{i}_mid")["norm"]["scale"])
                dbi.append(P(f"dw{i}_mid")["norm"]["bias"])
            Wdw = jnp.concatenate(wdw, axis=-1).astype(dtype)
            Bdw = jnp.concatenate(bdw, axis=-1).astype(dtype)
            pd = (kmax_dw - 1) // 2
            gm = jax.lax.conv_general_dilated(
                spatial_pad(g_dw, pd, padding_type), Wdw, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g_dw.shape[-1],
            ) + Bdw
            gf = gm.astype(jnp.float32)
            m2 = jnp.mean(gf, axis=(1, 2), keepdims=True)
            v2 = jnp.mean(jnp.square(gf), axis=(1, 2), keepdims=True) - jnp.square(m2)
            gm = jax.nn.relu(
                (gf - m2) * jax.lax.rsqrt(v2 + norm_eps) * jnp.concatenate(dsc)
                + jnp.concatenate(dbi)
            ).astype(dtype)
            packed = jnp.concatenate([h_res, gm], axis=-1)
        else:
            packed = h_res

        # ---- pack OUT conv (branch sum comes out directly) ----
        wout, bout = [], []
        for i, mid, k in res:
            wout.append(_center_pad_kernel(P(f"res{i}_out")["kernel"], kmax_out))
            bout.append(P(f"res{i}_out")["bias"])
        for i, mid, k in dw:
            wout.append(_center_pad_kernel(P(f"dw{i}_out")["kernel"], kmax_out))
            bout.append(P(f"dw{i}_out")["bias"])
        Wout = jnp.concatenate(wout, axis=-2).astype(dtype)  # stack on C_in
        Bout = sum(bout).astype(dtype)
        po = (kmax_out - 1) // 2
        total = jax.lax.conv_general_dilated(
            spatial_pad(packed, po, padding_type), Wout, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + Bout

        # pw_norm (no activation) + residual
        tf_ = total.astype(jnp.float32)
        m3 = jnp.mean(tf_, axis=(1, 2), keepdims=True)
        v3 = jnp.mean(jnp.square(tf_), axis=(1, 2), keepdims=True) - jnp.square(m3)
        total = (
            (tf_ - m3) * jax.lax.rsqrt(v3 + norm_eps) * P("pw_norm")["scale"]
            + P("pw_norm")["bias"]
        ).astype(dtype)
        return x + total

    return apply


def _block_module():
    from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
    from cat_tpu.models.blocks import InceptionBlock

    cfg = InceptionGeneratorConfig.make(
        ngf=64, channels=None, channels_reduction_factor=6,
        kernel_sizes=(1, 3, 5), n_blocks=9,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )
    block = InceptionBlock(
        cfg.blocks[0], norm=cfg.norm, padding_type=cfg.padding_type,
        active_fn=cfg.active_fn, use_bias=True,
    )
    return cfg, block


def check_packed():
    """CPU numerical parity: packed apply == InceptionBlock (f32)."""
    import numpy as np

    cfg, block = _block_module()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 256), jnp.float32)
    v = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(v, x)
    packed = make_packed_apply(cfg.blocks[0], padding_type=cfg.padding_type)
    got = packed(v["params"], x, dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"name": "packed_parity_max_err", "err": err}), flush=True)
    assert err < 2e-4, err


def probe_blocks():
    from cat_tpu.train.common import cast_floats

    cfg, block = _block_module()
    B = BATCH
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 256), jnp.bfloat16)
    v = block.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 256)))
    params16 = cast_floats(v["params"], jnp.bfloat16)
    packed = make_packed_apply(cfg.blocks[0], padding_type=cfg.padding_type)

    def make_current(n):
        @jax.jit
        def inner(params, x):
            def body(x, _):
                return block.apply({"params": params}, x), None

            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y[:1, :1, :1, :1])

        return lambda: inner(params16, x0)

    def make_packed_n(n):
        @jax.jit
        def inner(params, x):
            def body(x, _):
                return packed(params, x), None

            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y[:1, :1, :1, :1])

        return lambda: inner(v["params"], x0)

    _slope(make_current, name="block_fwd/current")
    _slope(make_packed_n, name="block_fwd/packed")

    def make_current_bwd(n):
        @jax.jit
        def inner(params, x):
            def f(p):
                def body(x, _):
                    return block.apply({"params": p}, x), None

                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))

            return jax.grad(f)(params)

        return lambda: inner(params16, x0)

    def make_packed_bwd(n):
        @jax.jit
        def inner(params, x):
            def f(p):
                def body(x, _):
                    return packed(p, x), None

                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))

            return jax.grad(f)(params)

        return lambda: inner(v["params"], x0)

    # backward scans keep n blocks' residuals alive: small rep counts
    _slope(make_current_bwd, reps=(1, 3), name="block_fwd_bwd/current")
    _slope(make_packed_bwd, reps=(1, 3), name="block_fwd_bwd/packed")


def probe_upsample():
    """Transposed conv (lhs_dilation) vs exact subpixel decomposition.

    torch ConvTranspose2d(k=3,s=2,p=1,op=1) == 4 sub-convs of <=2x2 taps,
    interleaved (depth-to-space).  If XLA lowers the dilated conv naively it
    computes 9 taps per output over a zero-dilated input (~2.25x the
    subpixel decomposition's work on the MXU).
    """
    B = BATCH
    for name, h, cin, cout in [("up0 64->128px 256->128", 64, 256, 128),
                               ("up1 128->256px 128->64", 128, 128, 64)]:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, h, h, cin), jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)
             * 0.01)

        def make_dilated(n, x0=x0, w=w, cin=cin, cout=cout):
            @jax.jit
            def inner(x0, w):
                def body(i, carry):
                    x, acc = carry
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    s = jnp.sum(y[:1, :1, :1, :1])
                    # keep a dependency that can't be hoisted: x shifts by a
                    # data-dependent-but-zero amount
                    x = x + jnp.zeros_like(x) * s
                    return (x, acc + s)

                _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.zeros((), jnp.bfloat16)))
                return acc

            return lambda: inner(x0, w)

        _slope(make_dilated, name=f"up/dilated {name}")

        def make_subpixel(n, x0=x0, w=w, cin=cin, cout=cout):
            # sub-kernel (di,dj): taps of the flipped kernel contributing to
            # output parity class (di,dj); build by slicing the 3x3 kernel.
            @jax.jit
            def inner(x0, w):
                wf = w[::-1, ::-1]  # correlation <-> convolution flip
                # output (2i+di, 2j+dj): contributions from input (i+a, j+b)
                subs = []
                for di in (0, 1):
                    for dj in (0, 1):
                        # taps (p,q) of wf with p%2==? -> build 2x2 zero-padded
                        sub = jnp.zeros((2, 2, wf.shape[2], wf.shape[3]), wf.dtype)
                        for p in range(3):
                            for q in range(3):
                                if (p - 1 + di) % 2 == 0 and (q - 1 + dj) % 2 == 0:
                                    a, b = (p - 1 + di) // 2, (q - 1 + dj) // 2
                                    sub = sub.at[a + 1 - di, b + 1 - dj].set(
                                        wf[2 - p, 2 - q]
                                    )
                        subs.append(sub)
                ws = jnp.concatenate(subs, axis=-1)  # (2,2,cin,4*cout)

                def body(i, carry):
                    x, acc = carry
                    y = jax.lax.conv_general_dilated(
                        x, ws, (1, 1), ((1, 0), (1, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    bb, hh, ww_, _ = y.shape
                    co = ws.shape[-1] // 4
                    y = y.reshape(bb, hh, ww_, 2, 2, co)
                    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bb, hh * 2, ww_ * 2, co)
                    s = jnp.sum(y[:1, :1, :1, :1])
                    x = x + jnp.zeros_like(x) * s
                    return (x, acc + s)

                _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.zeros((), jnp.bfloat16)))
                return acc

            return lambda: inner(x0, w)

        _slope(make_subpixel, name=f"up/subpixel {name}")


def probe_gen_variants():
    """Teacher fwd + student fwd/bwd across structural variants.

    Variants are math-identical re-executions of the same params:
      plain / packed (grouped branch convs) / subpixel upsample / both.
    """
    import bench as b

    dist, state, tv, res = build()
    from cat_tpu.models.generator import InceptionGenerator
    from cat_tpu.train.common import apply_net, cast_floats

    taps = dist.hp.mapping_layers
    rng = jax.random.PRNGKey(1)
    xa = jax.random.normal(rng, (BATCH, SIZE, SIZE, 3), jnp.float32)
    down = lambda t: cast_floats(t, jnp.bfloat16)

    for packed in (False, True):
        for upi in ("dilated", "subpixel"):
            tag = f"packed={int(packed)},up={upi}"
            t_model = InceptionGenerator(dist.teacher_cfg, packed_blocks=packed,
                                         upsample_impl=upi)
            s_model = InceptionGenerator(dist.student_cfg, packed_blocks=packed,
                                         upsample_impl=upi)

            @jax.jit
            def t_fwd(tv, xa):
                out, _ = apply_net(t_model, down(tv["params"]), {}, down(xa),
                                   train=False, taps=taps)
                return out[0]

            timed(t_fwd, tv, xa, name=f"teacher_fwd[{tag}]")

            @jax.jit
            def s_fwd_bwd(params, xa):
                def f(p):
                    (fake, acts), _ = apply_net(
                        s_model, down(p), state.g.stats, down(xa),
                        train=True, mutable_stats=True, taps=taps,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                    )
                    return jnp.sum(fake.astype(jnp.float32)) + sum(
                        jnp.sum(a.astype(jnp.float32)) for a in acts.values()
                    )

                return jax.grad(f)(params)

            timed(s_fwd_bwd, state.g.params["G"], xa, name=f"student_fwd_bwd[{tag}]")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "step"
    if which == "step":
        probe_step(fused=len(sys.argv) > 2 and sys.argv[2] == "fused")
    elif which == "convs":
        probe_convs()
    elif which == "peak":
        probe_peak()
    elif which == "check_packed":
        check_packed()
    elif which == "blocks":
        probe_blocks()
    elif which == "upsample":
        probe_upsample()
    elif which == "gen_variants":
        probe_gen_variants()

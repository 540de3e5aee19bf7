"""Generator-forward decomposition: where do the non-MXU cycles go?

The headline bench (bench.py) runs the StyleGAN2 generator at 256px/b64
bf16 at ~1480 img/s (~67% of v5e bf16 matmul peak by XLA's own FLOP
count). This script measures where the remaining time goes and A/Bs a
candidate optimization:

1. full forward timing (device-side fori_loop, one fetch per measurement
   — per-call fetches over the relay add ~40 ms of tunnel latency and
   made the round-1 per-call numbers meaningless) + XLA cost analysis
   (FLOPs, bytes accessed),
2. ablations: blur_2d -> crop (bounds the FIR-blur share of the
   forward), style-MLP alone (bounds the mapping-network share),
3. upsample-layer microbench: the current two-op path (3x3 lhs-dilated
   conv + depthwise 4x4 blur) vs a folded sub-pixel formulation
   (blur FIR folded into the conv kernel; 4 phase convs at input
   resolution + depth_to_space — one memory pass, all MACs dense on the
   MXU). Equivalence is exact (f32 CPU delta ~2e-7; verified against a
   scipy f64 oracle).

Usage (on the TPU): python -m synthesis_in_style_tpu.scripts.gen_profile
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_loop(loop_fn, *args, trials=3):
    """loop_fn is a jitted device-side loop returning a scalar; returns the
    best wall time over `trials` (seconds)."""
    val = float(loop_fn(*args))  # compile + warm
    assert val == val, "NaN accumulator"
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# folded sub-pixel upsample prototype
# ---------------------------------------------------------------------------


def fold_kernels(w: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Full 2-D convolution of the conv kernel w (k,k,in,out) with the FIR
    kernel f (fh,fw): g[u] = sum_v w[v] f[u-v], shape (k+fh-1, k+fw-1, in, out).
    Tiny (runs once per layer call); implemented as explicit shifts."""
    k = w.shape[0]
    fh, fw = f.shape
    gk = k + fh - 1
    g = jnp.zeros((gk, gk) + w.shape[2:], w.dtype)
    for dy in range(fh):
        for dx in range(fw):
            g = g.at[dy : dy + k, dx : dx + k].add(w * f[dy, dx])
    return g


def upsample_conv_current(x, w, f):
    """Current ModulatedConv2d upsample path (models/stylegan2.py:182-194):
    3x3 conv_transpose via lhs_dilation, then depthwise FIR blur."""
    k = w.shape[0]
    out = lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).astype(x.dtype),
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    from synthesis_in_style_tpu.ops.upfirdn2d import blur_2d

    p = (f.shape[0] - 2) - (k - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    return blur_2d(out, f * 4.0, (pad0, pad1))


def upsample_conv_folded(x, w, f):
    """Folded sub-pixel path: z = x (up 2) conv (w conv f*4), computed as 4
    phase convs at input resolution + depth_to_space.

    Derivation (1-D, K = k + fh - 1 = 6 for k=3, fh=4):
      z[j] = (x_up2 * g)[j + 2] = sum_i x[i] g[j + 2 - 2i]
      phase py = j mod 2, j = 2u + py, window i in {u-1, u, u+1}:
        P[py][a] = g[4 + py - 2a]   (a = i - (u-1) in {0,1,2}, all valid)
    so each 2-D phase is a 3x3 conv, uniform (1,1) padding."""
    g = fold_kernels(w.astype(jnp.float32), (f * 4.0).astype(jnp.float32))
    g = g.astype(x.dtype)
    b, h, ww_, cin = x.shape
    cout = g.shape[-1]
    phases = []
    for py in range(2):
        for px in range(2):
            ker = jnp.stack(
                [
                    jnp.stack(
                        [g[4 + py - 2 * a, 4 + px - 2 * bb] for bb in range(3)]
                    )
                    for a in range(3)
                ]
            )  # (3, 3, in, out)
            phases.append(
                lax.conv_general_dilated(
                    x, ker, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
    # depth_to_space: out[2u+py, 2v+px] = phases[py*2+px][u, v]
    ph = jnp.stack(phases, axis=3).reshape(b, h, ww_, 2, 2, cout)
    return ph.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * ww_, cout)


def main() -> None:
    from synthesis_in_style_tpu.models.stylegan2 import Generator
    from synthesis_in_style_tpu.ops.upfirdn2d import make_kernel

    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    BATCH, ITERS = 64, 20

    gen = Generator(size=256, style_dim=512, n_mlp=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))],
    )
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables
    )

    def make_loop():
        @jax.jit
        def synth_loop(variables, key):
            def body(i, acc):
                kz, kn = jax.random.split(jax.random.fold_in(key, i))
                z = jax.random.normal(kz, (BATCH, 512), jnp.bfloat16)
                img, _ = gen.apply(variables, [z], rngs={"noise": kn})
                return acc + jnp.mean(jnp.abs(img)).astype(jnp.float32)

            return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        return synth_loop

    # ---- 1. full forward + cost analysis ----
    loop = make_loop()
    t = timed_loop(loop, variables, jax.random.PRNGKey(2))
    per_img = t / (BATCH * ITERS)
    cost = loop.lower(variables, jax.random.PRNGKey(2)).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    # the cost model counts the fori_loop body ONCE, so totals are per
    # batch-of-BATCH, not per ITERS*BATCH
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    results["full_fwd"] = {
        "img_per_s": 1 / per_img,
        "gflop_per_img": flops / BATCH / 1e9,
        "gb_per_img": bytes_ / BATCH / 1e9,
        "tflops": flops / BATCH / per_img / 1e12,
        "mfu_vs_197tf": flops / BATCH / per_img / 197e12,
        "hbm_frac_vs_0.82tbs": bytes_ / BATCH / per_img / 0.82e12,
    }
    print("full_fwd:", json.dumps(results["full_fwd"]), flush=True)

    # ---- 2a. blur ablation (measurement-only monkeypatch; the crop keeps
    # the upsample-path output shape so downstream layers are unchanged) ----
    import synthesis_in_style_tpu.models.stylegan2 as sg2

    orig_blur = sg2.blur_2d
    sg2.blur_2d = lambda x, k, pad, upsample_factor=1: x[:, :-1, :-1, :]
    try:
        loop_nb = make_loop()
        t_nb = timed_loop(loop_nb, variables, jax.random.PRNGKey(2))
    finally:
        sg2.blur_2d = orig_blur
    results["no_blur"] = {
        "img_per_s": BATCH * ITERS / t_nb,
        "blur_share_of_fwd": 1 - t_nb / t,
    }
    print("no_blur:", json.dumps(results["no_blur"]), flush=True)

    # ---- 2b. style MLP alone ----
    @jax.jit
    def mlp_loop(variables, key):
        def body(i, acc):
            z = jax.random.normal(
                jax.random.fold_in(key, i), (BATCH, 512), jnp.bfloat16
            )
            w = gen.apply(variables, z, method=Generator.style)
            return acc + jnp.mean(jnp.abs(w)).astype(jnp.float32)

        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    t_mlp = timed_loop(mlp_loop, variables, jax.random.PRNGKey(2))
    results["style_mlp"] = {"share_of_fwd": t_mlp / t}
    print("style_mlp:", json.dumps(results["style_mlp"]), flush=True)

    # ---- 3. upsample-layer microbench (loop-in-jit, dependency-chained) ----
    f = make_kernel([1, 3, 3, 1])
    layer_shapes = [  # (h_in, c_in, c_out) for 256px generator upsamples
        (4, 512, 512), (8, 512, 512), (16, 512, 512), (32, 512, 512),
        (64, 512, 256), (128, 256, 128),
    ]
    micro = {}
    for h, cin, cout in layer_shapes:
        x = jnp.asarray(
            np.random.RandomState(1).randn(BATCH, h, h, cin), jnp.bfloat16
        )
        w = jnp.asarray(
            np.random.RandomState(2).randn(3, 3, cin, cout) * 0.05,
            jnp.bfloat16,
        )

        def make_micro_loop(op):
            @jax.jit
            def micro_loop(x, w):
                def body(i, carry):
                    xx, acc = carry
                    out = op(xx, w, f)
                    s = out[0, 0, 0, 0].astype(jnp.float32)
                    # chain the next iteration on this output so XLA cannot
                    # hoist the conv out of the loop
                    xx = xx * (1.0 + 0.0 * s).astype(xx.dtype)
                    return xx, acc + s

                (_, acc) = lax.fori_loop(
                    0, ITERS, body, (x, jnp.zeros((), jnp.float32))
                )
                return acc

            return micro_loop

        t_cur = timed_loop(make_micro_loop(upsample_conv_current), x, w)
        t_fold = timed_loop(make_micro_loop(upsample_conv_folded), x, w)
        key = f"h{h}_c{cin}->{cout}"
        micro[key] = {
            "cur_us": t_cur / ITERS * 1e6,
            "folded_us": t_fold / ITERS * 1e6,
            "speedup": t_cur / t_fold,
        }
        print(f"{key}:", json.dumps(micro[key]), flush=True)
    results["upsample_micro"] = micro
    print(json.dumps(results))


if __name__ == "__main__":
    main()

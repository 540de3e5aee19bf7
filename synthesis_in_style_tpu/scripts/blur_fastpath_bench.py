"""Separable shift-add FIR prototypes vs the fused depthwise-conv upfirdn2d.

gen_profile.py measured the FIR blurs at 16.8% of the generator forward
(no-blur ablation) while the folded-into-conv alternative lost 4-7x (XLA's
lhs-dilated conv already runs at useful-FLOPs efficiency). This script
attacks the blur directly: the (1,3,3,1) kernel is rank-1, so
blur = 1-D pass along H then along W — each pass a handful of
shift-multiply-adds that XLA fuses into elementwise code, instead of a
16-tap depthwise `conv_general_dilated` (which lowers poorly on TPU,
catastrophically so for the 3-channel ToRGB skip upsamples: C=3 out of 128
vector lanes).

Measures, per generator call-site shape:
  * blur (up=1): current fused depthwise conv vs separable shift-add
  * upsample_2d (up=2): same, with the 2-phase interleave derivation
and two full-forward ablations: randomize_noise=False (threefry share) and
rbg noise keys.

Usage (on the TPU): python -m synthesis_in_style_tpu.scripts.blur_fastpath_bench
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from synthesis_in_style_tpu.ops.upfirdn2d import make_kernel, upfirdn2d


def timed_loop(loop_fn, *args, trials=3):
    val = float(loop_fn(*args))
    assert val == val
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# separable shift-add prototypes (taps as static python floats)
# ---------------------------------------------------------------------------


def _pad_axis(x, pad0, pad1, axis):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (max(pad0, 0), max(pad1, 0))
    x = jnp.pad(x, pads)
    if pad0 < 0 or pad1 < 0:
        idx = [slice(None)] * x.ndim
        n = x.shape[axis]
        idx[axis] = slice(max(-pad0, 0), n - max(-pad1, 0))
        x = x[tuple(idx)]
    return x


def _blur_axis(x, taps, pad0, pad1, axis):
    """1-D correlation-with-flipped-taps (= true convolution) along `axis`
    with up=1: y[j] = sum_a x_pad[j+a] * taps[K-1-a]."""
    K = len(taps)
    xp = _pad_axis(x, pad0, pad1, axis)
    out_len = xp.shape[axis] - K + 1
    acc = None
    for a in range(K):
        t = taps[K - 1 - a]
        if t == 0.0:
            continue
        sl = lax.slice_in_dim(xp, a, a + out_len, axis=axis)
        term = sl * jnp.asarray(t, x.dtype)
        acc = term if acc is None else acc + term
    return acc


def blur_separable(x, taps, pad, gain=1.0):
    """(up=1, down=1) 2-D FIR with rank-1 kernel gain*outer(taps,taps)/sum^2;
    `taps` are the RAW 1-D taps (e.g. [1,3,3,1])."""
    s = sum(taps)
    g = gain ** 0.5
    t = [g * float(v) / s for v in taps]
    pad0, pad1 = pad
    x = _blur_axis(x, t, pad0, pad1, axis=1)
    x = _blur_axis(x, t, pad0, pad1, axis=2)
    return x


def _upsample2_axis(x, taps, pad0, axis):
    """1-D up-2 FIR along `axis`: z[2u+p] = sum_d taps[base_p + 2d] x[u-d],
    base_p = p + K - 1 - pad0 (derived from the upfirdn correlation
    identity). Output length 2*L exactly (the upsample_2d configuration)."""
    K = len(taps)
    L = x.shape[axis]
    phases = []
    for p in range(2):
        base = p + K - 1 - pad0
        ds = [d for d in range((-base + 1) // 2 - 1, K)
              if 0 <= base + 2 * d < K]
        # shifts x[u-d]: pad enough on both sides then slice
        lo = min(ds)
        hi = max(ds)
        xp = _pad_axis(x, hi, -lo if lo < 0 else 0, axis)
        # after left-pad hi: x[u-d] = xp[u + hi - d]
        acc = None
        for d in ds:
            t = taps[base + 2 * d]
            if t == 0.0:
                continue
            sl = lax.slice_in_dim(xp, hi - d, hi - d + L, axis=axis)
            term = sl * jnp.asarray(t, x.dtype)
            acc = term if acc is None else acc + term
        phases.append(acc)
    z = jnp.stack(phases, axis=axis + 1)  # (..., L, 2, ...)
    shape = list(x.shape)
    shape[axis] = 2 * L
    return z.reshape(shape)


def upsample2_separable(x, taps):
    """upsample_2d equivalent (factor 2): raw taps, gain factor**2,
    pad0 = (K - 2 + 1)//2 + 1, pad1 = (K - 2)//2 (ops/upfirdn2d.py:109-119).
    Output (B, 2H, 2W, C) requires pad0+pad1 == K - 1 (holds for even K)."""
    K = len(taps)
    s = sum(taps)
    t = [2.0 * float(v) / s for v in taps]  # sqrt(factor**2) gain per axis
    pad0 = (K - 2 + 1) // 2 + 2 - 1
    x = _upsample2_axis(x, t, pad0, axis=1)
    x = _upsample2_axis(x, t, pad0, axis=2)
    return x


def main() -> None:
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    print(f"devices: {jax.devices()}", flush=True)
    BATCH, ITERS = 64, 20
    RAW = [1.0, 3.0, 3.0, 1.0]
    k2d = make_kernel(RAW)
    results = {}

    # ---- correctness vs fused upfirdn2d (f32, on this backend) ----
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, 7, 5), jnp.float32)
    ref = upfirdn2d(x, k2d * 4.0, pad=(1, 1))
    got = blur_separable(x, RAW, (1, 1), gain=4.0)
    d1 = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    from synthesis_in_style_tpu.ops.upfirdn2d import upsample_2d

    ref2 = upsample_2d(x, k2d, 2)
    got2 = upsample2_separable(x, RAW)
    d2 = float(jnp.max(jnp.abs(ref2 - got2)) / jnp.max(jnp.abs(ref2)))
    print(f"parity: blur delta {d1:.2e}, upsample delta {d2:.2e}", flush=True)
    assert d1 < 1e-5 and d2 < 1e-5, (d1, d2)

    # ---- microbench at generator call-site shapes ----
    def bench_op(op, x):
        @jax.jit
        def loop(x):
            def body(i, carry):
                xx, acc = carry
                out = op(xx)
                s = out[0, 0, 0, 0].astype(jnp.float32)
                xx = xx * (1.0 + 0.0 * s).astype(xx.dtype)
                return xx, acc + s

            _, acc = lax.fori_loop(0, ITERS, body,
                                   (x, jnp.zeros((), jnp.float32)))
            return acc

        return timed_loop(loop, x) / ITERS * 1e6

    def blur_two_pass_conv(xx, gain=4.0):
        """Separable blur as TWO 1-D depthwise convs (4+4 taps instead of a
        16-tap 2-D depthwise conv): halves the VPU MACs, doubles the memory
        passes."""
        c = xx.shape[-1]
        g = gain ** 0.5
        t1 = (jnp.asarray(RAW, jnp.float32) / sum(RAW) * g).astype(xx.dtype)
        kv = jnp.broadcast_to(t1[::-1][:, None, None, None], (4, 1, 1, c))
        kh = jnp.broadcast_to(t1[::-1][None, :, None, None], (1, 4, 1, c))
        y = lax.conv_general_dilated(
            xx, kv, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return lax.conv_general_dilated(
            y, kh, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    blur_shapes = [  # post-upsample-conv blur inputs (2h+1), pad (1,1)
        (33, 512), (65, 512), (129, 256), (257, 128),
    ]
    micro = {}
    for h, c in blur_shapes:
        x = jnp.asarray(
            np.random.RandomState(1).randn(BATCH, h, h, c), jnp.bfloat16
        )
        if h == 33:
            refb = upfirdn2d(
                x.astype(jnp.float32), k2d * 4.0, pad=(1, 1))
            gotb = blur_two_pass_conv(x.astype(jnp.float32))
            db = float(jnp.max(jnp.abs(refb - gotb))
                       / jnp.max(jnp.abs(refb)))
            print(f"two-pass parity delta: {db:.2e}", flush=True)
            assert db < 1e-5, db
        cur = bench_op(lambda xx: upfirdn2d(xx, k2d * 4.0, pad=(1, 1)), x)
        sep = bench_op(
            lambda xx: blur_separable(xx, RAW, (1, 1), gain=4.0), x
        )
        two = bench_op(blur_two_pass_conv, x)
        micro[f"blur_h{h}_c{c}"] = {
            "fused_us": cur, "separable_us": sep, "two_pass_us": two,
            "speedup_two_pass": cur / two,
        }
        print(f"blur_h{h}_c{c}:", json.dumps(micro[f"blur_h{h}_c{c}"]),
              flush=True)

    import sys
    up_shapes = ([(32, 3), (64, 3), (128, 3), (128, 256)]
                 if "--full" in sys.argv else [])
    for h, c in up_shapes:
        x = jnp.asarray(
            np.random.RandomState(1).randn(BATCH, h, h, c), jnp.bfloat16
        )
        cur = bench_op(lambda xx: upsample_2d(xx, k2d, 2), x)
        sep = bench_op(lambda xx: upsample2_separable(xx, RAW), x)
        micro[f"up2_h{h}_c{c}"] = {
            "fused_us": cur, "separable_us": sep, "speedup": cur / sep
        }
        print(f"up2_h{h}_c{c}:", json.dumps(micro[f"up2_h{h}_c{c}"]),
              flush=True)
    results["micro"] = micro

    # ---- full-forward noise ablations ----
    gen = Generator(size=256, style_dim=512, n_mlp=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))],
    )
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables
    )

    def make_loop(randomize, rbg=False):
        @jax.jit
        def synth_loop(variables, key):
            def body(i, acc):
                kz, kn = jax.random.split(jax.random.fold_in(key, i))
                z = jax.random.normal(kz, (BATCH, 512), jnp.bfloat16)
                img, _ = gen.apply(
                    variables, [z],
                    randomize_noise=randomize,
                    rngs={"noise": kn} if randomize else {},
                )
                return acc + jnp.mean(jnp.abs(img)).astype(jnp.float32)

            return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        key = (jax.random.key(2, impl="rbg") if rbg
               else jax.random.PRNGKey(2))
        return synth_loop, key

    for name, (randomize, rbg) in ({
        "baseline_threefry_noise": (True, False),
        "rbg_noise": (True, True),
        "buffer_noise": (False, False),
    } if "--full" in sys.argv else {}).items():
        loop, key = make_loop(randomize, rbg)
        t = timed_loop(loop, variables, key)
        results[name] = {"img_per_s": BATCH * ITERS / t}
        print(f"{name}:", json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

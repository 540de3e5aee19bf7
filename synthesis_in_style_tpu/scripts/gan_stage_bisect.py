"""Per-stage timed bisect + byte counts for the StyleGAN2 D and G
(VERDICT r3 #2 — the seg_stage_bisect methodology applied to the largest
TPU-time consumer of the whole workflow, the GAN train steps:
reference updater/stylegan_2_updater.py:202-223, 100k iterations).

Method (scripts/seg_stage_bisect.py): the models expose a `capture` dict of
per-stage outputs (models/stylegan2.py — recorded WITHOUT stop_gradient);
for every stage we jit grad-of-mean of that stage's output. XLA dead-code
eliminates everything after it, so the compiled program IS the exact
fwd+bwd prefix; marginal wall time and `bytes accessed` attribute each
stage. Run on the chip:

    python -m synthesis_in_style_tpu.scripts.gan_stage_bisect \
        [--model d|g] [--size 256] [--batch 24] [--steps 10] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 819.0


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def build_d(size: int, batch: int):
    from synthesis_in_style_tpu.models.stylegan2 import Discriminator

    disc = Discriminator(size=size, channel_multiplier=2)
    variables = disc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    import math

    n_blocks = int(math.log2(size)) - 2
    stages = (
        ["conv_in"]
        + [f"block_{i}" for i in range(n_blocks)]
        + ["final_conv", "logits"]
    )
    x = jnp.zeros((batch, size, size, 3))

    def stage_loss(params, x, stage):
        cap = {}
        disc.apply({"params": params}, x, capture=cap)
        return jnp.mean(cap[stage].astype(jnp.float32))

    return variables["params"], x, stages, stage_loss


def build_g(size: int, batch: int):
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    gen = Generator(size=size, style_dim=512, n_mlp=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))],
    )
    import math

    log_size = int(math.log2(size))
    stages = ["style_mlp", "conv_1", "to_rgb_1"]
    i = 1
    for _ in range(log_size - 2):
        stages += [f"conv_{i + 1}", f"conv_{i + 2}", f"to_rgb_{i + 2}"]
        i += 2
    z = jnp.zeros((batch, 512))
    noises = variables["noises"]

    def stage_loss(params, z, stage):
        cap = {}
        gen.apply(
            {"params": params, "noises": noises},
            [z], randomize_noise=False, capture=cap,
        )
        return jnp.mean(cap[stage].astype(jnp.float32))

    return variables["params"], z, stages, stage_loss


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", choices=["d", "g"], default="d")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=24)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args(argv)

    print(f"devices: {jax.devices()}", flush=True)
    build = build_d if args.model == "d" else build_g
    params, x, stages, stage_loss = build(args.size, args.batch)
    if args.dtype:
        dt = jnp.dtype(args.dtype)
        params = _cast(params, dt)
        x = x.astype(dt)

    rows = []
    prev_ms, prev_gb = 0.0, 0.0
    for stage in stages:
        fn = jax.jit(jax.grad(lambda p, s=stage: stage_loss(p, x, s)))
        t0 = time.perf_counter()
        compiled = fn.lower(params).compile()
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gb = float(ca.get("bytes accessed", float("nan"))) / 1e9

        g = compiled(params)
        np.asarray(jax.tree_util.tree_leaves(g)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            g = compiled(params)
        np.asarray(jax.tree_util.tree_leaves(g)[0])
        ms = (time.perf_counter() - t0) / args.steps * 1e3

        d_ms, d_gb = ms - prev_ms, gb - prev_gb
        hbm_pct = (d_gb / (d_ms / 1e3) / V5E_HBM_GBPS * 100) if d_ms > 0 else 0
        rows.append((stage, ms, gb, d_ms, d_gb, hbm_pct))
        print(
            f"{args.model} prefix<={stage:>10}: {ms:8.2f} ms  {gb:7.2f} GB  "
            f"(marginal {d_ms:+7.2f} ms, {d_gb:+6.2f} GB, "
            f"~{hbm_pct:5.1f}% HBM roofline)  [compile {compile_s:.0f}s]",
            flush=True,
        )
        prev_ms, prev_gb = ms, gb

    print("\nstage | prefix_ms | prefix_GB | marginal_ms | marginal_GB | ~%HBM")
    for r in rows:
        print(
            f"{r[0]} | {r[1]:.2f} | {r[2]:.2f} | {r[3]:+.2f} | {r[4]:+.2f} "
            f"| {r[5]:.1f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Per-stage timed bisect + byte counts for EMANet and TransUNet
(VERDICT r3 #4 — the DocUFCN s2d methodology applied to the other two
segmenters).

Method: each model exposes a `capture` dict of per-stage outputs; the
bisect jits `value_and_grad` of "mean of stage k's output" for every
stage. XLA dead-code-eliminates everything after stage k, so the compiled
program IS the exact fwd+bwd prefix — its wall time and `bytes accessed`
attribute each stage's marginal cost without any model surgery. Run on
the chip:

    python -m synthesis_in_style_tpu.scripts.seg_stage_bisect \
        [--model emanet|transunet] [--size 256] [--batch 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 819.0


def _cast(tree, dtype):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def build_emanet(size: int):
    from synthesis_in_style_tpu.models.ema_net import EMANet, init_emau_mu

    model = EMANet(num_classes=3, n_layers=50, stride=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)), train=False,
    )
    mu = init_emau_mu(512, 64)
    stages = ["stem", "layer1", "layer2", "layer3", "layer4", "emau", "head"]

    def stage_loss(params, batch_stats, x, stage):
        cap: Dict = {}
        model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, mu, train=True, capture=cap,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(cap[stage].astype(jnp.float32))

    return model, variables, stages, stage_loss


def build_transunet(size: int):
    from synthesis_in_style_tpu.models.trans_u_net import (
        VIT_CONFIGS,
        VisionTransformer,
    )

    cfg = VIT_CONFIGS["R50-ViT-B_16"]()
    cfg["n_classes"] = 3
    cfg["n_skip"] = 3
    cfg["patches"]["grid"] = (size // 16, size // 16)
    model = VisionTransformer(config=cfg, img_size=size, num_classes=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)), train=False,
    )
    stages = [
        "r50_stem", "embeddings", "encoder",
        "decoder_0", "decoder_1", "decoder_2", "decoder_3", "head",
    ]

    def stage_loss(params, batch_stats, x, stage):
        cap: Dict = {}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        model.apply(
            variables, x, train=True, capture=cap,
            mutable=["batch_stats"] if batch_stats else [],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(cap[stage].astype(jnp.float32))

    return model, variables, stages, stage_loss


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", choices=["emanet", "transunet"],
                        default="emanet")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args(argv)

    print(f"devices: {jax.devices()}", flush=True)
    build = build_emanet if args.model == "emanet" else build_transunet
    model, variables, stages, stage_loss = build(args.size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.dtype:
        dt = jnp.dtype(args.dtype)
        params_c = _cast(params, dt)
        bs_c = _cast(batch_stats, dt)
    else:
        params_c, bs_c = params, batch_stats
    x = jnp.zeros(
        (args.batch, args.size, args.size, 3),
        jnp.dtype(args.dtype) if args.dtype else jnp.float32,
    )

    rows = []
    prev_ms, prev_gb = 0.0, 0.0
    for stage in stages:
        fn = jax.jit(
            jax.grad(lambda p, s=stage: stage_loss(p, bs_c, x, s))
        )
        t0 = time.perf_counter()
        compiled = fn.lower(params_c).compile()
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gb = float(ca.get("bytes accessed", float("nan"))) / 1e9

        g = compiled(params_c)
        jax.tree_util.tree_map(np.asarray, jax.tree_util.tree_leaves(g)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            g = compiled(params_c)
        jax.tree_util.tree_map(np.asarray, jax.tree_util.tree_leaves(g)[0])
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

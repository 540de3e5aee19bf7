"""Headline benchmark: StyleGAN2 256px document synthesis throughput on one
TPU chip (BASELINE.json metric: "StyleGAN2 synth images/sec/chip at 256px").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes:
* Runs the generator in bfloat16 at batch 64 — the production synthesis
  configuration (per-sample style modulation and demodulation statistics stay
  float32 inside ModulatedConv2d; the convs ride the MXU in bf16). Measured
  progression on one v5e: f32/b16 1103 -> f32/b64 1199 -> bf16/b64 ~1476
  -> bf16/b64/rbg-noise 1504 img/s.
* The reference publishes no numbers (BASELINE.md); `vs_baseline` is the
  ratio to a documented 60 img/s estimate for the reference's torch pipeline
  on a single V100-class GPU at 256px (batch inference incl. activation
  capture).
* Over the axon relay, `block_until_ready` can return before execution
  completes, so the generation loop runs device-side (`lax.fori_loop`) with a
  scalar accumulator and the timed region includes the value fetch.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 60.0  # documented estimate, see module docstring
# round-2 sweep: b64/threefry 1471 -> b96 1493 -> b128 1495 -> b128/rbg 1503
# img/s (b192 flat) — but b128 intermittently RESOURCE_EXHAUSTEDs over the
# dev relay, so the bench stays at the always-safe b64 with the rbg
# hardware-RNG noise stream (+1.3% measured at b64, a different-but-valid
# noise stream).
BATCH = 64
N_ITERS = 30
SIZE = 256
DTYPE = jnp.bfloat16


def main(quantized: bool = False, family: str = "stylegan2") -> None:
    if family == "swagan":
        from synthesis_in_style_tpu.models.swagan import Generator
    else:
        from synthesis_in_style_tpu.models.stylegan2 import Generator

    gen = Generator(size=SIZE, style_dim=512, n_mlp=8, quantized=quantized)
    z0 = jnp.zeros((BATCH, 512))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z0]
    )
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(DTYPE) if a.dtype == jnp.float32 else a, variables
    )

    @jax.jit
    def synth_loop(variables, key):
        def body(i, acc):
            kz, kn = jax.random.split(jax.random.fold_in(key, i))
            z = jax.random.normal(kz, (BATCH, 512), DTYPE)
            img, _ = gen.apply(variables, [z], rngs={"noise": kn})
            return acc + jnp.mean(jnp.abs(img)).astype(jnp.float32)

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((), jnp.float32))

    # compile + warm up (fetch forces completion over the relay)
    val = float(synth_loop(variables, jax.random.key(2, impl="rbg")))
    assert val == val and val > 0, f"bad accumulator: {val}"

    best = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        val = float(synth_loop(variables, jax.random.key(3 + trial, impl="rbg")))
        dt = time.perf_counter() - t0
        assert val == val, "NaN accumulator"
        best = max(best, BATCH * N_ITERS / dt)

    metric = f"{family}_synth_images_per_sec_256px"
    if quantized:
        metric += "_w8a8"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(
        quantized="--quantized" in sys.argv,
        family="swagan" if "--swagan" in sys.argv else "stylegan2",
    )

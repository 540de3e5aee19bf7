"""DocUFCN train-step roofline + dropout-RNG ablation on the real chip.

The MFU table (scripts/mfu_report.py) puts the DocUFCN train step at ~5% of
v5e bf16 matmul peak — by far the worst training path. Two hypotheses:

1. **HBM roofline, not MXU roofline.** The encoder runs five dilated 3x3
   convs at full 256x256 with 32-64 channels; arithmetic intensity there is
   ~10-25 FLOP/byte vs the ~240 FLOP/byte needed to be compute-bound on a
   v5e (197 bf16 TFLOP/s vs ~0.82 TB/s HBM). If so, the step should be
   judged against the memory roofline — this script extracts the compiled
   executable's `bytes accessed` and reports %-of-HBM-roofline.
2. **Dropout RNG tax.** The reference architecture applies Dropout(0.4)
   after all 23 convs (doc_ufcn.py:44-51), i.e. ~0.5 G threefry samples per
   b8 step at 256px on the VPU. The ablation times the step with (a) the
   default threefry stream, (b) an `rbg` hardware-RNG key for the dropout
   stream only, (c) dropout off — separating RNG cost from mask-apply cost.

Usage (on the TPU):
  python -m synthesis_in_style_tpu.scripts.docufcn_roofline [--steps 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _time_step(step, state, batch, rng, n_steps: int) -> float:
    state2, m = step(state, batch, rng)
    jax.tree_util.tree_map(np.asarray, m)  # force completion (relay-safe)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state2, m = step(state2, batch, rng)
    jax.tree_util.tree_map(np.asarray, m)
    return (time.perf_counter() - t0) / n_steps


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
    from synthesis_in_style_tpu.updaters.segmentation_updater import (
        create_seg_train_state,
        make_standard_train_step,
    )

    print(f"devices: {jax.devices()}", flush=True)
    size, batch = args.size, args.batch
    tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(1)
    data = {
        "images": jnp.zeros((batch, size, size, 3), jnp.float32),
        "segmented": jnp.zeros((batch, size, size), jnp.int32),
    }

    model = DocUFCN(num_classes=3)
    state = create_seg_train_state(model, jax.random.PRNGKey(0), size, tx)

    step = make_standard_train_step(
        model, tx, donate=False, compute_dtype="bfloat16"
    )

    # roofline accounting from the compiled executable
    compiled = step.lower(state, data, rng).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))
    print(
        f"cost model: {flops / 1e9:.1f} GFLOP/step, "
        f"{byt / 1e9:.2f} GB accessed/step, "
        f"intensity {flops / byt:.1f} FLOP/byte "
        f"(compute-bound needs ~{V5E_BF16_PEAK_TFLOPS * 1e3 / V5E_HBM_GBPS:.0f})",
        flush=True,
    )

    dt = _time_step(step, state, data, rng, args.steps)
    results = {"baseline(threefry)": dt}
    mxu_pct = flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100
    hbm_pct = byt / dt / 1e9 / V5E_HBM_GBPS * 100
    print(
        f"baseline(threefry): {dt * 1e3:.1f} ms/step "
        f"({batch / dt:.0f} samples/s) — {mxu_pct:.0f}% of MXU peak, "
        f"{hbm_pct:.0f}% of HBM roofline",
        flush=True,
    )

    # (b) hardware-RNG key for the dropout stream
    step_rbg = make_standard_train_step(
        model, tx, donate=False, compute_dtype="bfloat16",
        dropout_rng_impl="rbg",
    )
    dt = _time_step(step_rbg, state, data, rng, args.steps)
    results["rbg dropout keys"] = dt
    print(
        f"rbg dropout keys:   {dt * 1e3:.1f} ms/step "
        f"({batch / dt:.0f} samples/s)",
        flush=True,
    )

    # (c) dropout off entirely — upper bound for any RNG optimization
    model_nd = DocUFCN(num_classes=3, encoder_dropout=0.0, decoder_dropout=0.0)
    state_nd = create_seg_train_state(model_nd, jax.random.PRNGKey(0), size, tx)
    step_nd = make_standard_train_step(
        model_nd, tx, donate=False, compute_dtype="bfloat16"
    )
    dt = _time_step(step_nd, state_nd, data, rng, args.steps)
    results["dropout off"] = dt
    print(
        f"dropout off:        {dt * 1e3:.1f} ms/step "
        f"({batch / dt:.0f} samples/s)",
        flush=True,
    )

    # (d/e) per-block rematerialization: bandwidth-bound + idle MXU means
    # recomputing intra-block activations in bwd SAVES wall clock by
    # cutting residual HBM traffic (numerically identical — same rng)
    model_rm = DocUFCN(num_classes=3, remat=True)
    state_rm = create_seg_train_state(model_rm, jax.random.PRNGKey(0), size, tx)
    for label, impl in (("remat", None), ("remat+rbg", "rbg")):
        step_rm = make_standard_train_step(
            model_rm, tx, donate=False, compute_dtype="bfloat16",
            dropout_rng_impl=impl,
        )
        compiled_rm = step_rm.lower(state_rm, data, rng).compile()
        ca_rm = compiled_rm.cost_analysis()
        ca_rm = ca_rm[0] if isinstance(ca_rm, (list, tuple)) else ca_rm
        dt = _time_step(step_rm, state_rm, data, rng, args.steps)
        results[label] = dt
        print(
            f"{label + ':':<19} {dt * 1e3:.1f} ms/step "
            f"({batch / dt:.0f} samples/s) — "
            f"{float(ca_rm.get('flops', 0)) / 1e9:.1f} GFLOP, "
            f"{float(ca_rm.get('bytes accessed', 0)) / 1e9:.2f} GB accessed",
            flush=True,
        )

    base = results["baseline(threefry)"]
    for k, v in results.items():
        print(f"{k}: {base / v:.2f}x vs baseline")


if __name__ == "__main__":
    main()

"""Per-step FLOPs + MFU accounting for every training path.

The reference publishes no performance numbers at all (SURVEY.md §6); this
tool produces the FLOPs/step, steps/s, achieved TFLOP/s and %-of-peak table
that MEASUREMENTS.md cites, answering "fast or just correct?" for the
training half of the workload (VERDICT r1 weak #1).

FLOPs come from XLA's cost model on the lowered step
(`jit(f).lower(...).compile().cost_analysis()["flops"]`) — an arithmetic
count independent of the executing backend, so it can be extracted on the
CPU backend (fast) and combined with step timings measured on the chip.

Usage (two phases because the platform choice is process-global):
  JAX_PLATFORMS=cpu python -m synthesis_in_style_tpu.scripts.mfu_report \
      flops /tmp/mfu.json [--workloads gan,docufcn]
  python -m synthesis_in_style_tpu.scripts.mfu_report \
      time /tmp/mfu.json [--steps 20]    # on the TPU
  python -m synthesis_in_style_tpu.scripts.mfu_report report /tmp/mfu.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# TPU v5e (v5 lite) bf16 matrix peak and HBM bandwidth per chip.
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


# ---------------------------------------------------------------------------
# workload definitions — production configs (reference workload sizes,
# BASELINE.md: GAN 256px b24; seg 256px b8)
# ---------------------------------------------------------------------------

def _gan_steps() -> Dict[str, Tuple[Callable, tuple]]:
    from synthesis_in_style_tpu.models.stylegan2 import (
        Discriminator,
        Generator,
    )
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        StyleGAN2Config,
        create_gan_train_state,
        make_train_steps,
    )

    size, batch = 256, 24
    gen = Generator(size=size, style_dim=512, n_mlp=8)
    disc = Discriminator(size=size)
    tx = optax.adam(2e-3, b1=0.0, b2=0.99)
    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), size, tx, tx
    )
    steps = make_train_steps(
        gen, disc, tx, tx,
        StyleGAN2Config(compute_dtype="bfloat16"),
        batch, donate=False,
    )
    real = jnp.zeros((batch, size, size, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)
    return {
        f"gan/{name}@{size}px/b{batch}/bf16": (fn, args)
        for name, fn, args in [
            ("d_step", steps["d_step"], (state, real, rng)),
            ("g_step", steps["g_step"], (state, rng)),
            ("d_reg_step(r1)", steps["d_reg_step"], (state, real)),
            ("g_reg_step(path)", steps["g_reg_step"], (state, rng)),
        ]
    }


def _seg_steps(which: str) -> Dict[str, Tuple[Callable, tuple]]:
    from synthesis_in_style_tpu.updaters.segmentation_updater import (
        create_seg_train_state,
        make_emanet_train_step,
        make_standard_train_step,
        make_transunet_train_step,
    )

    size, batch, classes = 256, 8, 3
    tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(1)
    batch_data = {
        "images": jnp.zeros((batch, size, size, 3), jnp.float32),
        "segmented": jnp.zeros((batch, size, size), jnp.int32),
    }

    if which in ("docufcn", "docufcn-s2d", "docufcn-s2dt"):
        from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN

        s2d = which in ("docufcn-s2d", "docufcn-s2dt")
        tail = which == "docufcn-s2dt"
        model = DocUFCN(
            num_classes=classes, s2d_stem=int(s2d), s2d_tail=tail
        )
        state = create_seg_train_state(model, jax.random.PRNGKey(0), size, tx)
        # production config (configs/segmenter/stylegan2_doc_ufcn_segmenter
        # .yaml): bf16 compute + hardware-RNG dropout stream
        step = make_standard_train_step(
            model, tx, donate=False, compute_dtype="bfloat16",
            dropout_rng_impl="rbg",
        )
        tag = ("+s2d+tail" if tail else "+s2d") if s2d else ""
        name = f"seg/docufcn@{size}px/b{batch}/bf16+rbg{tag}"
    elif which in ("emanet", "emanet-s2d"):
        from synthesis_in_style_tpu.models.ema_net import EMANet

        s2d = which == "emanet-s2d"
        model = EMANet(
            num_classes=classes, n_layers=50, stride=8, s2d_stem=s2d
        )
        state = create_seg_train_state(
            model, jax.random.PRNGKey(0), size, tx,
            extra=model.init_mu(seed=0),
        )
        step = make_emanet_train_step(
            model, tx, em_mom=0.9, donate=False, compute_dtype="bfloat16"
        )
        tag = "+s2d" if s2d else ""
        name = f"seg/emanet-r50@{size}px/b{batch}/bf16{tag}"
    elif which.startswith("transunet"):
        from synthesis_in_style_tpu.models.trans_u_net import (
            VIT_CONFIGS,
            VisionTransformer,
        )

        # transunet[512][-flash]: 512 = the reference's TransUNet workload
        # size; -flash = Pallas flash-attention lowering (same params)
        if "512" in which:
            size = 512
            batch_data = {
                "images": jnp.zeros((batch, size, size, 3), jnp.float32),
                "segmented": jnp.zeros((batch, size, size), jnp.int32),
            }
        impl = "flash" if which.endswith("-flash") else "xla"
        cfg = VIT_CONFIGS["R50-ViT-B_16"]()
        cfg["n_classes"] = classes
        cfg["n_skip"] = 3
        cfg["patches"]["grid"] = (size // 16, size // 16)
        cfg["attention_impl"] = impl
        model = VisionTransformer(
            config=cfg, img_size=size, num_classes=classes
        )
        state = create_seg_train_state(model, jax.random.PRNGKey(0), size, tx)
        step = make_transunet_train_step(
            model, tx, num_classes=classes, donate=False,
            compute_dtype="bfloat16",
        )
        tag = "+flash" if impl == "flash" else ""
        name = f"seg/transunet-r50vitb16@{size}px/b{batch}/bf16{tag}"
    else:
        raise ValueError(which)
    return {name: (step, (state, batch_data, rng))}


def _aux_steps(which: str) -> Dict[str, Tuple[Callable, tuple]]:
    """The remaining trainer paths (VERDICT r2 next-round #8): PixelEnsemble
    (DatasetGAN), adversarial generator, and autoencoder reconstruction."""
    rng = jax.random.PRNGKey(1)

    if which == "pixel_ensemble":
        from synthesis_in_style_tpu.models.pixel_classifier import (
            PixelClassifier,
            PixelEnsembleClassifier,
        )
        from synthesis_in_style_tpu.models.stylegan2 import generator_channels
        from synthesis_in_style_tpu.updaters.dataset_gan_updater import (
            create_ensemble_train_state,
            make_ensemble_train_step,
        )

        # feature dim = concatenated per-pixel activation channels of the
        # 256px generator's 14 capture layers (data/dataset_gan_dataset.py
        # scale_activations), ensemble of 3 like the production config
        # (configs/dataset_creation/dataset_gan_wpi_stylegan2.yaml). The
        # reference feeds 4-pixel batches (DataLoader batch_size); on TPU
        # that is pure dispatch overhead, so the MFU row uses a
        # device-filling 65536-pixel batch — same math per pixel.
        channels = generator_channels(2)
        sizes = [4, 8, 8, 16, 16, 32, 32, 64, 64, 128, 128, 256, 256]
        dim = channels[4] + sum(channels[s] for s in sizes)
        classes, members, batch = 3, 3, 65536
        ensemble = PixelEnsembleClassifier(classes, dim, members)
        tx = optax.adam(5e-4)
        state = create_ensemble_train_state(ensemble, tx)
        step = make_ensemble_train_step(ensemble.model, tx, donate=False)
        batch_data = {
            "activations": jnp.zeros((batch, dim), jnp.float32),
            "label": jnp.zeros((batch,), jnp.int32),
        }
        name = f"aux/pixel-ensemble-m{members}-d{dim}/b{batch}px"
        return {name: (step, (state, batch_data))}

    if which == "adversarial":
        from synthesis_in_style_tpu.losses.perceptual import (
            PerceptualAndStyleLoss,
        )
        from synthesis_in_style_tpu.models.autoencoder import (
            ContentAndStyleStyleganAutoencoder,
            StyleganAutoencoder,
        )
        from synthesis_in_style_tpu.models.encoder import WPlusEncoder
        from synthesis_in_style_tpu.models.stylegan2 import (
            Discriminator,
            Generator,
            generator_channels,
        )
        from synthesis_in_style_tpu.updaters.adversarial_updater import (
            AdversarialTrainState,
            make_adversarial_steps,
        )

        size, batch, latent = 256, 8, 512
        channels = generator_channels(2)
        gen_kwargs = dict(size=size, style_dim=latent, n_mlp=8)
        generator = ContentAndStyleStyleganAutoencoder(
            encoder=WPlusEncoder(size, latent, 6, channels),
            decoder=Generator(**gen_kwargs),
        )
        reconstructor = StyleganAutoencoder(
            encoder=WPlusEncoder(size, latent, 3, channels),
            decoder=Generator(**gen_kwargs),
        )
        disc = Discriminator(size=size)
        g_tx = optax.adam(2e-3)
        d_tx = optax.adam(2e-3)
        pas = PerceptualAndStyleLoss()
        steps = make_adversarial_steps(
            generator, disc, reconstructor, g_tx, d_tx, pas, donate=False
        )
        key = jax.random.PRNGKey(0)
        binary = jnp.zeros((batch, size, size, 3))
        style = jnp.zeros((batch, size, size, 3))
        g_vars = generator.init(
            {"params": key, "noise": key}, binary[:1], style[:1], train=False
        )
        r_vars = reconstructor.init(
            {"params": key, "noise": key}, style[:1], train=False
        )
        d_vars = disc.init(key, style[:1])
        state = AdversarialTrainState(
            g_params=g_vars["params"],
            g_batch_stats=g_vars.get("batch_stats", {}),
            g_noises=g_vars.get("noises", {}),
            d_params=d_vars["params"],
            reconstructor_variables=r_vars,
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        return {
            f"aux/adversarial-g_step@{size}px/b{batch}": (
                steps["g_step"], (state, binary, style, rng)
            ),
            f"aux/adversarial-d_step@{size}px/b{batch}": (
                steps["d_step"], (state, binary, style, rng)
            ),
        }

    if which == "autoencoder":
        from synthesis_in_style_tpu.losses.lpips import LPIPS
        from synthesis_in_style_tpu.models.autoencoder import (
            StyleganAutoencoder,
        )
        from synthesis_in_style_tpu.models.encoder import WPlusEncoder
        from synthesis_in_style_tpu.models.stylegan2 import (
            Generator,
            generator_channels,
        )
        from synthesis_in_style_tpu.updaters.autoencoder_updater import (
            create_ae_train_state,
            make_autoencoder_train_step,
        )

        size, batch, latent = 256, 8, 512
        ae = StyleganAutoencoder(
            encoder=WPlusEncoder(size, latent, 3, generator_channels(2)),
            decoder=Generator(size=size, style_dim=latent, n_mlp=8),
        )
        state, tx = create_ae_train_state(
            ae, jax.random.PRNGKey(0), size, optax.adam(1e-3)
        )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # random-backbone LPIPS is fine
            # for an MFU row — same FLOPs as the calibrated one
            lpips = LPIPS(net="vgg")
        step = make_autoencoder_train_step(ae, tx, lpips=lpips, donate=False)
        batch_data = {
            "input_image": jnp.zeros((batch, size, size, 3)),
            "output_image": jnp.zeros((batch, size, size, 3)),
        }
        name = f"aux/autoencoder+lpips@{size}px/b{batch}"
        return {name: (step, (state, batch_data, rng))}

    raise ValueError(which)


def build_workloads(names) -> Dict[str, Tuple[Callable, tuple]]:
    out: Dict[str, Tuple[Callable, tuple]] = {}
    for n in names:
        if n == "gan":
            out.update(_gan_steps())
        elif n in ("pixel_ensemble", "adversarial", "autoencoder"):
            out.update(_aux_steps(n))
        else:
            out.update(_seg_steps(n))
    return out


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def phase_flops(out_path: Path, names) -> None:
    record = {}
    if out_path.exists():
        record = json.loads(out_path.read_text())
    for req in names:
        # "-flash" workloads route attention through a Pallas kernel, which
        # (a) cannot lower on the CPU backend this phase runs on and (b) is
        # opaque to XLA's cost model anyway. The math is identical to the
        # XLA lowering, so extract FLOPs from the XLA twin and record them
        # under the flash workload's display name.
        is_flash = req.endswith("-flash")
        src = req[:-6] if is_flash else req
        twin = build_workloads([src])
        for name, (fn, args) in twin.items():
            display = name + "+flash" if is_flash else None
            lowered = fn.lower(*args)
            analyses = lowered.cost_analysis()
            if analyses is None:  # some backends only analyze post-compile
                analyses = lowered.compile().cost_analysis()
            # cost_analysis returns one dict (new jax) or a per-device list
            ca = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
            flops = float(ca["flops"])
            key = display or name
            record.setdefault(key, {})["flops"] = flops
            print(f"{key}: {flops / 1e9:.1f} GFLOP/step")
    out_path.write_text(json.dumps(record, indent=2))


def phase_time(out_path: Path, names, n_steps: int) -> None:
    import time

    record = json.loads(out_path.read_text()) if out_path.exists() else {}
    for name, (fn, args) in build_workloads(names).items():
        state = args[0]
        rest = args[1:]
        # explicit compile so the TPU executable's cost analysis (true HBM
        # bytes for THIS backend's fusions/layouts) can be extracted — the
        # memory-roofline denominator for bandwidth-bound steps
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            record.setdefault(name, {})["bytes_accessed"] = float(
                ca["bytes accessed"]
            )
        except Exception as e:  # cost analysis is best-effort per backend
            print(f"{name}: no bytes accessed ({e})")
        # warm up (compile) and reach steady state
        state, m = fn(state, *rest)
        jax.tree_util.tree_map(np.asarray, m)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = fn(state, *rest)
        # force completion by fetching a metric scalar (block_until_ready is
        # unreliable over the relay)
        jax.tree_util.tree_map(np.asarray, m)
        dt = (time.perf_counter() - t0) / n_steps
        record.setdefault(name, {})["seconds_per_step"] = dt
        print(f"{name}: {dt * 1e3:.1f} ms/step")
    out_path.write_text(json.dumps(record, indent=2))


def phase_report(out_path: Path) -> None:
    record = json.loads(out_path.read_text())
    print(
        "| step | GFLOP/step | ms/step | TFLOP/s | % of v5e bf16 peak "
        "| GB/step | % of HBM roofline |"
    )
    print("|---|---|---|---|---|---|---|")
    for name, row in record.items():
        flops = row.get("flops")
        dt = row.get("seconds_per_step")
        if flops is None or dt is None:
            print(f"| {name} | (incomplete) | | | | | |")
            continue
        tflops = flops / dt / 1e12
        pct = 100.0 * tflops / V5E_BF16_PEAK_TFLOPS
        byt = row.get("bytes_accessed")
        if byt is None:
            hbm = "| |"
        else:
            hbm_pct = 100.0 * byt / 1e9 / dt / V5E_HBM_GBPS
            hbm = f"| {byt / 1e9:.1f} | {hbm_pct:.0f}% |"
        print(
            f"| {name} | {flops / 1e9:.1f} | {dt * 1e3:.1f} "
            f"| {tflops:.1f} | {pct:.0f}% {hbm}"
        )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("phase", choices=["flops", "time", "report"])
    parser.add_argument("out", type=Path)
    parser.add_argument(
        "--workloads",
        default="gan,docufcn,emanet,transunet",
        help="comma-separated: gan, docufcn, docufcn-s2d, docufcn-s2dt, "
        "emanet, transunet, transunet-flash, transunet512, transunet512-flash",
    )
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()
    names = [w for w in args.workloads.split(",") if w]
    if args.phase == "flops":
        # FLOPs are backend-independent; force CPU so the axon sitecustomize
        # default doesn't pull the extraction through the remote relay
        jax.config.update("jax_platforms", "cpu")
        phase_flops(args.out, names)
    elif args.phase == "time":
        phase_time(args.out, names, args.steps)
    else:
        phase_report(args.out)


if __name__ == "__main__":
    main()

"""Cluster-discovery FIT throughput at the reference workload (VERDICT r3 #5).

The catalogs-fit stage of `create_semantic_segmentation` was the reference's
worst CPU hot loop (reference create_semantic_segmentation.py:181-187 fits a
sklearn MiniBatchSphericalKMeans per layer per k on (N*H*W, C) CPU arrays —
spherical_kmeans.py:161-312). This benchmark times the rebuild's on-device
fit (`segmentation.kmeans.MiniBatchSphericalKMeans` via FactorCatalog) on
REAL generator activations at the reference workload shape, and optionally
the sklearn MiniBatchKMeans fit on the host for the same data
(`--sklearn-layers`, bounded — the full sklearn grid takes hours, which is
the point).

Workload: N samples (default 100, the CLI default; --num-samples 1000 for
the VERDICT-scale run) x all capture layers of a 256px StyleGAN2 x
k in --cluster-range (default 3..24).

Usage:
    python -m synthesis_in_style_tpu.scripts.kmeans_fit_bench \
        [--num-samples 100] [--cluster-range 3 25] [--image-size 256] \
        [--layers 4,5,6] [--sklearn-layers 6] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_synth(image_size: int):
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    gen = Generator(size=image_size, style_dim=512, n_mlp=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))],
    )

    @jax.jit
    def synth(z):
        _, acts = gen.apply(
            variables, [z], randomize_noise=False,
            return_intermediate_activations=True,
        )
        return acts

    return synth


def layer_activations_on_device(
    synth, layer: int, num_samples: int, batch: int = 16
) -> jnp.ndarray:
    """(N*H*W, C) device array of ONE layer's activations. Everything stays
    on device — over the dev relay a host round-trip of even one 256px
    layer (GBs) would dominate the whole benchmark; a real TPU host
    wouldn't pay it either (the production CLI's fused path keeps
    activations device-side too)."""
    chunks = []
    done = 0
    while done < num_samples:
        z = jax.random.normal(jax.random.PRNGKey(100 + done), (batch, 512))
        acts = synth(z)
        keep = acts[layer]
        del acts  # drop the other layers' device buffers promptly
        chunks.append(keep)
        done += batch
    return jnp.concatenate(chunks, axis=0)[:num_samples]  # (N, H, W, C)


def discover_layers(synth):
    acts = synth(jnp.zeros((1, 512)))
    shapes = {k: tuple(v.shape[1:]) for k, v in acts.items()}
    del acts
    return shapes


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--num-samples", type=int, default=100)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--cluster-range", nargs=2, type=int, default=[3, 25])
    parser.add_argument("--layers", default=None,
                        help="comma-separated layer ids (default: all)")
    parser.add_argument("--sklearn-layers", default=None,
                        help="layer ids to ALSO fit with sklearn "
                        "MiniBatchKMeans on the host (bounded comparison)")
    parser.add_argument("--sklearn-k", type=int, default=6)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    from synthesis_in_style_tpu.segmentation.factor_catalog import (
        FactorCatalog,
    )

    synth = make_synth(args.image_size)
    shapes = discover_layers(synth)
    layer_ids = sorted(shapes)
    if args.layers:
        keep = {int(x) for x in args.layers.split(",")}
        layer_ids = [l for l in layer_ids if l in keep]
    print(f"layers: {[(l, shapes[l]) for l in layer_ids]}", flush=True)

    ks = list(range(args.cluster_range[0], args.cluster_range[1]))
    results = {
        "num_samples": args.num_samples, "fits": [], "sklearn": [],
    }
    # HBM guard: one layer's activations must fit on the chip (f32).
    # v5e has 16 GB; leave room for the fit's normalized copy (~2x).
    budget = 6e9
    skipped = [
        l for l in layer_ids
        if args.num_samples * np.prod(shapes[l]) * 4 > budget
    ]
    if skipped:
        print(
            f"SKIPPING layers {skipped}: activations exceed the {budget/1e9:.0f} GB "
            "per-layer device budget at this --num-samples (the fit "
            "normalizes a second copy) — lower --num-samples or use "
            "--layers to select",
            flush=True,
        )
        layer_ids = [l for l in layer_ids if l not in skipped]
    total = 0.0
    gen_total = 0.0
    for layer in layer_ids:
        t0 = time.perf_counter()
        x_dev = layer_activations_on_device(
            synth, layer, args.num_samples
        )
        x_dev.block_until_ready()
        gen_s = time.perf_counter() - t0
        gen_total += gen_s
        n_, h_, w_, c = x_dev.shape
        pts = n_ * h_ * w_
        for k in ks:
            t0 = time.perf_counter()
            cat = FactorCatalog(k)
            labels = cat.fit_predict(x_dev)
            # force a real sync over the relay
            _ = int(np.asarray(labels[:1, :1, :1])[0, 0, 0])
            dt = time.perf_counter() - t0
            total += dt
            results["fits"].append(
                {"layer": int(layer), "k": k, "points": int(pts),
                 "dim": int(c), "seconds": dt}
            )
            print(f"layer {layer} ({pts}x{c}) k={k}: {dt:.2f}s", flush=True)
        del x_dev
    results["total_fit_s"] = total
    results["generate_s"] = gen_total
    from synthesis_in_style_tpu.segmentation.kmeans import (
        _fit_epoch,
        _kmeanspp_init,
        assign_euclidean,
    )

    results["compiled_programs"] = {
        "fit_epoch": _fit_epoch._cache_size(),
        "kmeanspp_init": _kmeanspp_init._cache_size(),
        "assign": assign_euclidean._cache_size(),
    }
    print(
        f"TOTAL device fit time ({len(layer_ids)} layers x {len(ks)} k): "
        f"{total:.1f}s (+{gen_total:.1f}s activation generation); "
        f"compiled programs {results['compiled_programs']}",
        flush=True,
    )

    if args.sklearn_layers:
        from sklearn.cluster import MiniBatchKMeans

        for layer in (int(x) for x in args.sklearn_layers.split(",")):
            a = np.asarray(
                layer_activations_on_device(synth, layer, args.num_samples)
            )
            flat = a.reshape(-1, a.shape[-1])
            # L2-normalized data approximates the reference's spherical
            # variant with stock sklearn (its 0.24-private-API subclass
            # does not run on this sklearn)
            norm = flat / (
                np.linalg.norm(flat, axis=1, keepdims=True) + 1e-12
            )
            t0 = time.perf_counter()
            MiniBatchKMeans(
                n_clusters=args.sklearn_k, batch_size=16384, n_init=3
            ).fit(norm)
            dt = time.perf_counter() - t0
            results["sklearn"].append(
                {"layer": int(layer), "k": args.sklearn_k,
                 "points": int(flat.shape[0]), "seconds": dt}
            )
            print(f"sklearn layer {layer} k={args.sklearn_k}: {dt:.2f}s",
                  flush=True)

    if args.json:
        from pathlib import Path

        Path(args.json).write_text(json.dumps(results, indent=2))
        print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Warmed stage timing for labelled-dataset synthesis at production size.

Measures the three stages of the north-star loop on the real chip at
256px/b16 (the round-1 MEASUREMENTS configuration: 4 cluster layers, k=6):

1. generate      — StyleGAN2 forward with intermediate-activation capture
2a. host path    — fused prepare (k-means assign + cluster→class merge +
                   resize + bit-packed transfer) then the host contour
                   stage (`segment_prepared`)
2b. device path  — the rasterized on-device back half
                   (`begin/finish_segment_on_device`): only (B,H,W,3)
                   uint8 color masks + drop flags cross the link

Reports ms/img per stage and end-to-end img/s for both modes. Over the
dev relay the transfer share is inflated (~low-MB/s tunnel); on a real
TPU host it is negligible — both numbers are printed so the split is
visible.

Usage (on the TPU):
  python -m synthesis_in_style_tpu.scripts.pipeline_profile \
      [--size 256] [--batch 16] [--batches 4] [--k 6]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--batches", type=int, default=4)
    parser.add_argument("--k", type=int, default=6)
    args = parser.parse_args()

    from synthesis_in_style_tpu.models.stylegan2 import Generator
    from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
        BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
    )
    from synthesis_in_style_tpu.segmentation.factor_catalog import (
        FactorCatalog,
        save_catalogs,
    )

    print(f"devices: {jax.devices()}", flush=True)
    size, batch, k = args.size, args.batch, args.k
    gen = Generator(size=size, style_dim=512, n_mlp=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, gen.style_dim))],
    )

    @jax.jit
    def synth(params, noises, z):
        return gen.apply(
            {"params": params, "noises": noises},
            [z],
            randomize_noise=False,
            return_intermediate_activations=True,
        )

    z0 = jnp.asarray(
        np.random.RandomState(0).randn(batch, gen.style_dim).astype("f4")
    )
    imgs, acts = synth(variables["params"], variables["noises"], z0)

    # synthetic catalogs over the SAME layer/channel dims as round-1's
    # measurement: 2 coarse + 2 fine cluster layers, k clusters each
    keys = [str(kk) for kk in sorted(acts.keys())[-4:]]
    label_names = ["background", "printed_text", "handwritten_text"]
    tmp = Path(tempfile.mkdtemp(prefix="pipeprof_"))
    (tmp / "catalogs").mkdir()
    rng = np.random.RandomState(2)
    catalogs = {}
    for kk in keys:
        cat = FactorCatalog(k=k)
        cat._kmeans.cluster_centers_ = rng.randn(
            k, acts[int(kk)].shape[-1]
        ).astype("f4")
        catalogs[kk] = cat
    save_catalogs(catalogs, tmp / "catalogs" / f"{k}.npz")
    (tmp / f"merged_classes_{k}.json").write_text(
        json.dumps(
            {kk: {str(i): label_names[i % 3] for i in range(k)} for kk in keys}
        )
    )
    seg = BlackWhiteHandwrittenPrintedTextDatasetSegmenter(
        tmp,
        image_size=size,
        class_to_color_map={
            "background": "#000000",
            "printed_text": "#0000FF",
            "handwritten_text": "#FF0000",
        },
        keys_for_class_determination=keys[:2],
        keys_for_finegrained_segmentation=keys[2:],
        num_clusters=k,
        min_class_contour_area=10,
        only_keep_overlapping=False,
    )
    acts_in = {kk: v for kk, v in acts.items() if str(kk) in seg.catalog}

    n_imgs = batch * args.batches

    # ---- warm every program once (compiles are minutes over the relay) ----
    t0 = time.time()
    np.asarray(imgs)
    stacked = seg.begin_prepare(acts_in)
    predicted = seg.finish_prepare(stacked)
    seg.segment_prepared(predicted, batch)
    pending = seg.begin_segment_on_device(acts_in)
    seg.finish_segment_on_device(pending)
    print(f"warmup (incl. compiles): {time.time() - t0:.1f}s", flush=True)

    results = {}

    def timeit(name, fn):
        t0 = time.perf_counter()
        for i in range(args.batches):
            fn(i)
        ms = (time.perf_counter() - t0) / n_imgs * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/img", flush=True)

    zs = [
        jnp.asarray(
            np.random.RandomState(10 + i)
            .randn(batch, gen.style_dim)
            .astype("f4")
        )
        for i in range(args.batches)
    ]

    def gen_only(i):
        img, a = synth(variables["params"], variables["noises"], zs[i])
        jax.tree_util.tree_map(np.asarray, img)

    timeit("generate(+image fetch)", gen_only)

    def host_path(i):
        _, a = synth(variables["params"], variables["noises"], zs[i])
        a = {kk: v for kk, v in a.items() if str(kk) in seg.catalog}
        pred = seg.finish_prepare(seg.begin_prepare(a))
        seg.segment_prepared(pred, batch)

    timeit("e2e host contours", host_path)

    def device_path(i):
        _, a = synth(variables["params"], variables["noises"], zs[i])
        a = {kk: v for kk, v in a.items() if str(kk) in seg.catalog}
        seg.finish_segment_on_device(seg.begin_segment_on_device(a))

    timeit("e2e device contours", device_path)

    def device_compute_only(i):
        # fetch ONLY the (B,) drop flags: forces the whole fused program
        # to execute but keeps the device->host transfer out of the
        # measurement — isolates the on-device cost of the rasterized
        # contour back half (over the relay the mask transfer dominates;
        # on a real TPU host it is negligible and THIS number is the cost)
        _, a = synth(variables["params"], variables["noises"], zs[i])
        a = {kk: v for kk, v in a.items() if str(kk) in seg.catalog}
        _, drop = seg.begin_segment_on_device(a)
        np.asarray(drop)

    timeit("device contours (compute only)", device_compute_only)

    for name in ("e2e host contours", "e2e device contours"):
        print(f"{name}: {1e3 / results[name]:.1f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

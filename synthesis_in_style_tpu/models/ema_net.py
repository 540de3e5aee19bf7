"""EMANet — Expectation-Maximization Attention segmentation network,
TPU-native flax.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/ema_net/network.py), re-designed
for TPU:

* **NHWC layout**; the EM attention inner loop is two batched matmuls per
  iteration ((B, N, C) @ (C, K) and its transpose-counterpart) that map
  straight onto the MXU — the reference's bmm chain (network.py:219-249).
* The µ bases are explicit state, not a registered buffer: `__call__` takes
  `mu` (shape (1, C, K)) and returns the batch µ for the train step's
  moving-average update (`updaters.segmentation_updater.make_emanet_train_step`;
  reference does this mutation host-side in the updater,
  segmentation_updater.py:56-66).
* The vendored SynchronizedBatchNorm library (~1.6k LoC,
  ema_net/bn_lib/) is replaced by plain `nn.BatchNorm` — under a
  batch-sharded jit the statistics are global (SURVEY.md §2.6).
* Deep-stem dilated ResNet-50/101/152 backbone, output stride 8 or 16
  (network.py:59-166); head fc0 → EMAU(512, k=64, 3 EM iterations under
  stop_gradient) → fc1 (+Dropout 0.1) → fc2, bilinear align_corners=True
  upsample back to input size (network.py:267-311).
* The reference computes CE inside forward (returns (loss, mu)); here the
  loss lives in the train step — the module returns logits (+ µ in train
  mode), which is the cleaner functional split.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig

Array = jax.Array

BN_MOM = 3e-4
RESNET_LAYERS = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


def _bn(train: bool, name: str):
    # torch momentum 3e-4 accumulates (1-3e-4) of the old stat; flax momentum
    # is the old-stat fraction directly
    return nn.BatchNorm(
        use_running_average=not train, momentum=1.0 - BN_MOM, name=name
    )


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          name: str = None, use_bias: bool = False):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=[(pad, pad), (pad, pad)],
        use_bias=use_bias,
        name=name,
    )


# ---------------------------------------------------------------------------
# space-to-depth stem (round-3 bisect: the stem is ~20% of the train step at
# only ~32% of the HBM roofline — the same low-channel-at-high-resolution
# signature the DocUFCN s2d stem converted into 1.46x). All transforms are
# EXACT re-lowerings with the identical parameter tree; packing follows
# models/doc_ufcn.py `space_to_depth` (channel index (2a+b)*C + c).
# ---------------------------------------------------------------------------

def _s2d_stem_conv1_kernel(w: Array) -> Array:
    """(3,3,Ci,Co) stride-2 pad-1 conv -> (3,3,4Ci,4Co) stride-2 conv on
    the s2d input that emits the OUTPUT in s2d packing too. Derivation:
    out128[2y'+a] reads img rows 4y'+2a+dy; in block/phase coords that is
    kernel tap e=floor((2a+dy)/2) (+1), input phase (2a+dy) mod 2 — padding
    must be (1,0) per spatial dim."""
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    K = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for ti, dy in enumerate((-1, 0, 1)):
                for tj, dx in enumerate((-1, 0, 1)):
                    ry, rx = 2 * a + dy, 2 * b + dx
                    ey, py = ry // 2, ry % 2
                    ex, px = rx // 2, rx % 2
                    K = K.at[
                        ey + 1,
                        ex + 1,
                        (2 * py + px) * ci:(2 * py + px + 1) * ci,
                        (2 * a + b) * co:(2 * a + b + 1) * co,
                    ].add(w[ti, tj])
    return K


class _S2DStemConv(nn.Module):
    """Stem conv in s2d layout with the exact param shape of the `_conv` it
    replaces. mode='entry': the stride-2 3x3 input conv (s2d in, s2d out);
    mode='block': a stride-1 3x3 conv applied via the DocUFCN block
    kernel (s2d in, s2d out)."""

    features: int
    in_features: int
    mode: str = "block"

    @nn.compact
    def __call__(self, xq: Array) -> Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        from synthesis_in_style_tpu.models.doc_ufcn import _s2d_block_kernel

        if self.mode == "entry":
            K = _s2d_stem_conv1_kernel(kernel.astype(xq.dtype))
            return jax.lax.conv_general_dilated(
                xq, K, window_strides=(2, 2), padding=((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        K, step = _s2d_block_kernel(kernel.astype(xq.dtype), 1)
        return jax.lax.conv_general_dilated(
            xq, K, window_strides=(1, 1),
            padding=((step, step), (step, step)),
            rhs_dilation=(step, step),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _s2d_bn(xq: Array, train: bool, name: str) -> Array:
    """BatchNorm on an s2d tensor with stats per ORIGINAL channel: fold the
    4 phase groups into the spatial axis so the standard nn.BatchNorm sees
    the exact same value set (and parameter/stat tree) as the unpacked
    path."""
    b, h, w, c4 = xq.shape
    c = c4 // 4
    xr = xq.reshape(b, h, w * 4, c)
    xr = _bn(train, name)(xr)
    return xr.reshape(b, h, w, c4)


def _s2d_maxpool_3x3_s2(xq: Array) -> Array:
    """3x3/stride-2/pad-1 maxpool of the logical (2H,2W,C) tensor computed
    from its s2d packing; emits the UNPACKED (H,W,C) result (what layer1
    consumes). Row taps r=2y+d, d in {-1,0,1} -> (block,phase) in
    {(y-1,1),(y,0),(y,1)}."""
    b, h, w, c4 = xq.shape
    c = c4 // 4
    neg = jnp.finfo(xq.dtype).min
    xp = jnp.pad(
        xq, ((0, 0), (1, 0), (1, 0), (0, 0)), constant_values=neg
    )
    taps = [(-1, 1), (0, 0), (0, 1)]
    out = None
    for by, py in taps:
        for bx, px in taps:
            sl = xp[
                :, 1 + by:1 + by + h, 1 + bx:1 + bx + w,
                (2 * py + px) * c:(2 * py + px + 1) * c,
            ]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


def resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with align_corners=True (torch F.interpolate parity,
    reference network.py:296). NHWC."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    rows0 = x[:, y0]
    rows1 = x[:, y1]
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class Bottleneck(nn.Module):
    """ResNet bottleneck (reference network.py:19-56)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, name="downsample_conv")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    """_make_layer (reference network.py:103-133): first block may stride /
    downsample; dilation 2 stages start at dilation 1, dilation 4 stages at
    dilation 2; per-block grids multiply the dilation."""

    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    grids: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        grids = list(self.grids) if self.grids else [1] * self.blocks
        in_ch = x.shape[-1]
        has_down = self.stride != 1 or in_ch != self.planes * 4
        first_dilation = {1: 1, 2: 1, 4: 2}[self.dilation]
        x = Bottleneck(
            self.planes, self.stride, first_dilation, has_down, name="block_0"
        )(x, train=train)
        for i in range(1, self.blocks):
            x = Bottleneck(
                self.planes, 1, self.dilation * grids[i], False, name=f"block_{i}"
            )(x, train=train)
        return x


class ResNetExtractor(nn.Module):
    """Deep-stem dilated ResNet feature extractor (reference network.py:59-101
    stem + layers 1-4, used via `extractor`, :276-285)."""

    n_layers: int = 50
    stride: int = 8
    s2d_stem: bool = False

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, capture: Optional[dict] = None
    ) -> Array:
        """`capture`: pass a dict to collect per-stage outputs (stem,
        layer1..4) — consumed by scripts/seg_stage_bisect.py, where XLA's
        dead-code elimination turns "loss of stage k" into an exact prefix
        program; no effect on the normal path."""
        layers = RESNET_LAYERS[self.n_layers]
        if self.s2d_stem:
            # exact space-to-depth re-lowering of the deep stem: identical
            # parameter/stat tree, bit-level-equivalent math (see the
            # helpers above + tests/test_s2d_stem.py); the whole stem runs
            # at half spatial resolution with 4x the channels, which packs
            # the TPU's 128-wide lanes the 64-channel 3x3s cannot
            from synthesis_in_style_tpu.models.doc_ufcn import (
                space_to_depth,
            )

            xq = space_to_depth(x)
            xq = _S2DStemConv(64, 3, mode="entry", name="stem_conv1")(xq)
            xq = _s2d_bn(xq, train, "stem_bn1")
            xq = nn.relu(xq)
            xq = _S2DStemConv(64, 64, name="stem_conv2")(xq)
            xq = _s2d_bn(xq, train, "stem_bn2")
            xq = nn.relu(xq)
            xq = _S2DStemConv(128, 64, name="stem_conv3")(xq)
            xq = _s2d_bn(xq, train, "bn1")
            xq = nn.relu(xq)
            x = _s2d_maxpool_3x3_s2(xq)
        else:
            # deep stem: 3x3 s2 -> 3x3 -> 3x3 (reference conv1 Sequential
            # :63-71)
            x = _conv(64, 3, 2, name="stem_conv1")(x)
            x = _bn(train, "stem_bn1")(x)
            x = nn.relu(x)
            x = _conv(64, 3, name="stem_conv2")(x)
            x = _bn(train, "stem_bn2")(x)
            x = nn.relu(x)
            x = _conv(128, 3, name="stem_conv3")(x)
            x = _bn(train, "bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
        if capture is not None:
            capture["stem"] = x

        x = ResNetStage(64, layers[0], name="layer1")(x, train=train)
        if capture is not None:
            capture["layer1"] = x
        x = ResNetStage(128, layers[1], stride=2, name="layer2")(x, train=train)
        if capture is not None:
            capture["layer2"] = x
        if self.stride == 16:
            x = ResNetStage(256, layers[2], stride=2, name="layer3")(x, train=train)
            if capture is not None:
                capture["layer3"] = x
            x = ResNetStage(
                512, layers[3], stride=1, dilation=2, grids=[1, 2, 4], name="layer4"
            )(x, train=train)
        elif self.stride == 8:
            x = ResNetStage(
                256, layers[2], stride=1, dilation=2, name="layer3"
            )(x, train=train)
            if capture is not None:
                capture["layer3"] = x
            x = ResNetStage(
                512, layers[3], stride=1, dilation=4, grids=[1, 2, 4], name="layer4"
            )(x, train=train)
        else:
            raise RuntimeError(f"unknown stride: {self.stride}")
        if capture is not None:
            capture["layer4"] = x
        return x


def _l2norm(x: Array, axis: int) -> Array:
    return x / (1e-6 + jnp.linalg.norm(x, axis=axis, keepdims=True))


def init_emau_mu(channels: int, k: int, seed: int = 0) -> Array:
    """Kaiming-normal, channel-l2-normalized µ bases (reference EMAU.__init__,
    network.py:195-199)."""
    mu = jax.random.normal(jax.random.PRNGKey(seed), (1, channels, k)) * math.sqrt(
        2.0 / k
    )
    return _l2norm(mu, axis=1)


class EMAU(nn.Module):
    """Expectation-Maximization Attention Unit (reference network.py:187-264).

    `mu`: (1, C, K) bases. Returns (features, batch µ) — the µ moving
    average is applied by the train step."""

    channels: int
    k: int
    stage_num: int = 3

    @nn.compact
    def __call__(
        self, x: Array, mu: Array, train: bool = False
    ) -> Tuple[Array, Array]:
        idn = x
        x = nn.Conv(self.channels, (1, 1), name="conv1")(x)

        b, h, w, c = x.shape
        x_flat = x.reshape(b, h * w, c)  # (B, N, C)
        mu = jnp.broadcast_to(mu.astype(x.dtype), (b, c, self.k))

        # The whole EM loop runs without gradient (reference torch.no_grad,
        # network.py:224-232); the final attention reuses the LAST
        # iteration's z (computed against the pre-update µ), so it carries
        # no gradient either — gradients reach conv1 only through later
        # training signals, exactly as in the reference.
        def em_iter(mu, _):
            z = jax.nn.softmax(x_flat @ mu, axis=2)  # (B, N, K)
            z_norm = z / (1e-6 + jnp.sum(z, axis=1, keepdims=True))
            new_mu = jnp.einsum("bnc,bnk->bck", x_flat, z_norm)
            return _l2norm(new_mu, axis=1), z

        mu, zs = jax.lax.stop_gradient(
            jax.lax.scan(em_iter, mu, None, length=self.stage_num)
        )
        z = zs[-1]

        x_attn = jnp.einsum("bnk,bck->bnc", z, mu).reshape(b, h, w, c)
        x_attn = nn.relu(x_attn)

        out = nn.Conv(c, (1, 1), use_bias=False, name="conv2_conv")(x_attn)
        out = _bn(train, "conv2_bn")(out)
        out = nn.relu(out + idn)
        return out, mu


class EMANet(nn.Module):
    """Reference EMANet (network.py:267-311). Input NHWC in [-1, 1];
    `__call__(x, mu, train)` returns (logits, batch µ) when train else
    logits. µ defaults to the module's deterministic init when not given."""

    num_classes: int
    n_layers: int = 50
    stride: int = 8
    stage_num: int = 3
    emau_channels: int = 512
    emau_k: int = 64
    s2d_stem: bool = False  # exact stem re-lowering, same param tree

    def segmenter_config(
        self,
        background_class_id: int = 0,
        min_confidence: float = 0.0,
        min_contour_area: int = 0,
    ) -> SegmenterConfig:
        return SegmenterConfig(
            num_classes=self.num_classes,
            background_class_id=background_class_id,
            min_confidence=min_confidence,
            min_contour_area=min_contour_area,
        )

    def init_mu(self, seed: int = 0) -> Array:
        return init_emau_mu(self.emau_channels, self.emau_k, seed)

    @nn.compact
    def __call__(
        self, x: Array, mu: Optional[Array] = None, train: bool = False,
        capture: Optional[dict] = None,
    ) -> Any:
        if mu is None:
            mu = init_emau_mu(self.emau_channels, self.emau_k)
        size = x.shape[1:3]
        x = ResNetExtractor(
            self.n_layers, self.stride, self.s2d_stem, name="extractor"
        )(x, train=train, capture=capture)
        x = _conv(self.emau_channels, 3, name="fc0_conv")(x)
        x = _bn(train, "fc0_bn")(x)
        x = nn.relu(x)
        x, mu_batch = EMAU(
            self.emau_channels, self.emau_k, self.stage_num, name="emau"
        )(x, mu, train=train)
        if capture is not None:
            capture["emau"] = x
        x = _conv(256, 3, name="fc1_conv")(x)
        x = _bn(train, "fc1_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), name="fc2")(x)

        pred = resize_bilinear_align_corners(x, size[0], size[1])
        if capture is not None:
            capture["head"] = pred
        if train:
            return pred, mu_batch
        return pred

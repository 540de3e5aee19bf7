"""DocUFCN — dilated fully-convolutional document segmenter, TPU-native flax.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/doc_ufcn/doc_ufcn.py:11-104),
re-designed for TPU:

* **NHWC layout**; every conv is a large static-shape `nn.Conv` that XLA
  tiles onto the MXU.
* Encoder: 4 blocks (feature sizes 32/64/128/256), each a stack of five
  3x3 convs with dilations (1, 2, 4, 8, 16) + BatchNorm + ReLU + Dropout,
  2x2 max-pool between blocks (reference build_encoder_conv_block :56-61,
  forward :72-76). Same-padding for a k=3 dilated conv is exactly
  `padding = dilation` (reference calc_padding :53-54 reduces to this).
* Decoder: conv + 2x-transpose-conv upsample, skip-concat with the encoder
  feature of the same resolution (reference build_decoder_conv_block :63-69,
  forward :78-82); `PixelShuffleDocUFCN` swaps the transpose conv for a
  conv→depth-to-space (reference :94-104).
* BatchNorm: plain `nn.BatchNorm` — under a batch-sharded jit the batch
  statistics are computed over the *global* batch, which subsumes the
  reference's vendored SyncBN machinery (SURVEY.md §2.6).
* Postprocess defaults min_confidence=0.7, min_contour_area=55
  (reference :13-15) are carried in `segmenter_config()`.

Variants selected by `get_doc_ufcn(version)` (reference
doc_ufcn/__init__.py:6-15): 'base' | 'no_dropout' | 'pixelshuffle'.
"""

from __future__ import annotations

from typing import Sequence, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig

Array = jax.Array

ENCODER_DILATIONS = (1, 2, 4, 8, 16)


# ---------------------------------------------------------------------------
# Space-to-depth stem (opt-in, exact).
#
# The encoder's first block runs five 3x3 convs at full resolution with only
# `feature_sizes[0]` (32) channels. On TPU that is the worst possible shape:
# the (8,128) lane tiling pads 32-channel buffers 4x in HBM, and the MXU
# computes a 32->32 conv at 1/16 utilization — measured 57% of the whole
# eval forward (MEASUREMENTS.md "DocUFCN space-to-depth stem"). Packing the
# 2x2 pixel parity into channels ((B,H,W,C) -> (B,H/2,W/2,4C)) and running
# each conv with an equivalent dense "block kernel" is EXACT:
#
# * even dilation d: parity is preserved; taps sit at block offsets
#   {-d/2, 0, d/2} on the same parity plane (a kernel_dilation=d/2 conv);
# * d=1: taps mix parities but stay within block offsets {-1, 0, 1};
# * in both cases zero block padding reproduces the original one-pixel
#   zero padding exactly (no tap reaches the extra padded row);
# * the 2x2/stride-2 maxpool after the block becomes a channelwise max
#   over the 4 parity groups — no spatial pool at all.
#
# The dense block kernel costs 4x the FLOPs (its parity structure is
# mostly zeros) but measured 1.96x FASTER on v5e because the 128-channel
# operands use full lanes (a feature_group_count=4 formulation with 1x
# FLOPs measured 0.96x — grouped convs don't help on TPU). The transform
# consumes the UNCHANGED parameter tree (kernel construction is a cheap
# traced scatter, differentiable, so training is exact too); BatchNorm
# reduces over the parity groups so batch statistics stay per original
# channel. Only the dropout mask stream differs (iid either way).
# ---------------------------------------------------------------------------


def space_to_depth(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel index (2*a + b)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: Array, c: int) -> Array:
    """Inverse of `space_to_depth`."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def _s2d_block_kernel(w: Array, dilation: int) -> tuple:
    """Exact block-space kernel for a 3x3 same-padded conv with `dilation`.

    `w` is (3, 3, Ci, Co) HWIO; returns ((3, 3, 4Ci, 4Co), block_dilation)
    for a conv on the space-to-depth tensor with padding = block_dilation.
    Traced jnp ops (36 static scatter-adds over zeros) — differentiable,
    so the same path serves training.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    # Only d == 1 and even dilations preserve the 2x2 parity structure; an
    # odd dilation > 1 would make `by // step + 1` land outside [0, 2] and
    # jnp's .at[] would silently wrap the negative index into a WRONG tap
    # position rather than erroring.
    assert dilation == 1 or dilation % 2 == 0, dilation
    step = max(dilation // 2, 1)
    K = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for ti, dy in enumerate((-dilation, 0, dilation)):
                for tj, dx in enumerate((-dilation, 0, dilation)):
                    ry, rx = a + dy, b + dx
                    by, pa = ry // 2, ry % 2
                    bx, pb = rx // 2, rx % 2
                    K = K.at[
                        by // step + 1,
                        bx // step + 1,
                        (2 * pa + pb) * ci:(2 * pa + pb + 1) * ci,
                        (2 * a + b) * co:(2 * a + b + 1) * co,
                    ].add(w[ti, tj])
    return K, step


class _S2DConv(nn.Module):
    """3x3 same-padded dilated conv applied in space-to-depth layout.

    Declares `kernel`/`bias` with the exact shapes and initializers of the
    `nn.Conv` it replaces, so the parameter tree (and every checkpoint /
    torch converter) is identical to the standard path.
    """

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, xq: Array) -> Array:
        ci = xq.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, ci, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        K, step = _s2d_block_kernel(kernel.astype(xq.dtype), self.dilation)
        out = jax.lax.conv_general_dilated(
            xq,
            K,
            window_strides=(1, 1),
            padding=((step, step), (step, step)),
            rhs_dilation=(step, step),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.tile(bias, 4).astype(out.dtype)


class _ParityBatchNorm(nn.Module):
    """BatchNorm over space-to-depth tensors with statistics per ORIGINAL
    channel (reduces over batch, space, and the 4 parity groups) — exactly
    `nn.BatchNorm` of the unpacked tensor. Same param/stat names and
    shapes as `nn.BatchNorm` (momentum 0.9, eps 1e-5)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xq: Array, use_running_average: bool) -> Array:
        c = xq.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        b, h, w, _ = xq.shape
        xg = xq.reshape(b, h, w, 4, c)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # stats in (at least) f32, like flax's BatchNorm promotion
            xf = xg.astype(jnp.promote_types(jnp.float32, xg.dtype))
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (xg - mean.astype(xg.dtype)) * inv.astype(xg.dtype) + bias.astype(
            xg.dtype
        )
        return out.reshape(b, h, w, 4 * c)


def parity_max_pool(xq: Array) -> Array:
    """2x2/stride-2 maxpool of the unpacked tensor, computed in s2d layout:
    channelwise max over the 4 parity groups. Returns standard layout
    (B, H/2, W/2, C)."""
    b, h, w, c4 = xq.shape
    return jnp.max(xq.reshape(b, h, w, 4, c4 // 4), axis=3)


def parity_concat(a: Array, b: Array) -> Array:
    """Channel concat of two s2d tensors IN s2d layout: equals
    `space_to_depth(concat(unpack(a), unpack(b)))` — the parity groups of
    the two operands are interleaved group-by-group, not appended."""
    bsz, h, w, ca4 = a.shape
    ca, cb = ca4 // 4, b.shape[-1] // 4
    a = a.reshape(bsz, h, w, 4, ca)
    b = b.reshape(bsz, h, w, 4, cb)
    return jnp.concatenate([a, b], axis=-1).reshape(bsz, h, w, 4 * (ca + cb))


class _S2DConvTranspose2x2(nn.Module):
    """2x2/stride-2 VALID `nn.ConvTranspose` producing s2d-layout output.

    A 2x2/s2 transpose conv tiles the output exactly: output parity (a, b)
    is a plain matmul of the (unchanged-resolution) input with the FLIPPED
    kernel tap `w[1-a, 1-b]` (flax `ConvTranspose` with the default
    `transpose_kernel=False` flips spatially — pinned numerically in
    tests/test_s2d_stem.py). So the packed output is ONE 1x1 conv
    (B, H, W, Ci) -> (B, H, W, 4*Co): full 128-lane occupancy instead of a
    4x-padded (B, 2H, 2W, Co) buffer. Declares `kernel`/`bias` with the
    exact shapes and initializers of the `nn.ConvTranspose` it replaces."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, ci, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        k = kernel.astype(x.dtype)
        # packed group (2a+b) <- w[1-a, 1-b]
        K = jnp.concatenate([k[1, 1], k[1, 0], k[0, 1], k[0, 0]], axis=-1)
        out = jnp.einsum("bhwc,cd->bhwd", x, K)
        return out + jnp.tile(bias, 4).astype(out.dtype)


class ConvBNActDrop(nn.Module):
    """conv → BatchNorm → ReLU → Dropout (reference build_conv_layer,
    doc_ufcn.py:44-51)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.4
    transpose: bool = False
    # apply the conv in space-to-depth layout (input AND output packed
    # (B, H/2, W/2, 4C)); exact, same parameter tree — see module header
    s2d: bool = False
    # 2x2/s2 transpose upsample with UNPACKED input and PACKED output
    # (same resolution as the input, 4x channels) — see _S2DConvTranspose2x2
    s2d_up: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.s2d_up:
            assert self.transpose and self.kernel_size == 2 and self.stride == 2
            x = _S2DConvTranspose2x2(self.features, name="conv")(x)
            x = _ParityBatchNorm(name="bn")(x, use_running_average=not train)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return x
        if self.s2d:
            assert not self.transpose and self.kernel_size == 3 and self.stride == 1
            x = _S2DConv(self.features, dilation=self.dilation, name="conv")(x)
            x = _ParityBatchNorm(name="bn")(x, use_running_average=not train)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return x
        if self.transpose:
            x = nn.ConvTranspose(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="VALID",
                name="conv",
            )(x)
        else:
            pad = self.dilation if self.kernel_size == 3 else self.kernel_size // 2
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_dilation=(self.dilation, self.dilation),
                padding=[(pad, pad), (pad, pad)],
                name="conv",
            )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class EncoderBlock(nn.Module):
    """Five dilated convs, dilations 1/2/4/8/16 (reference
    build_encoder_conv_block, doc_ufcn.py:56-61)."""

    features: int
    dropout: float = 0.4
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, dilation in enumerate(ENCODER_DILATIONS):
            x = ConvBNActDrop(
                self.features, dilation=dilation, dropout=self.dropout,
                s2d=self.s2d, name=f"conv_{i}",
            )(x, train=train)
        return x


class DecoderBlock(nn.Module):
    """conv then 2x transpose-conv upsample (reference
    build_decoder_conv_block, doc_ufcn.py:63-69)."""

    features: int
    dropout: float = 0.4
    # emit the upsampled tensor in s2d layout (exact; see "Space-to-depth
    # decoder tail" in the module header)
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBNActDrop(self.features, dropout=self.dropout, name="conv")(
            x, train=train
        )
        x = ConvBNActDrop(
            self.features, kernel_size=2, stride=2, dropout=self.dropout,
            transpose=True, s2d_up=self.s2d_out, name="upsample",
        )(x, train=train)
        return x


class PixelShuffleDecoderBlock(nn.Module):
    """conv to 4x features then depth-to-space (reference PixelShuffleDocUFCN,
    doc_ufcn.py:94-104; torch PixelShuffle == NHWC depth_to_space)."""

    features: int
    dropout: float = 0.4
    # emit the pre-shuffle tensor as-is: the conv's 4C output IS the s2d
    # layout of the shuffled result (same (2a+b)C+c channel convention as
    # `space_to_depth`), so the packed output is BITWISE the standard one —
    # BN/dropout included — minus the unshuffle permutation
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBNActDrop(
            self.features * 4, dropout=self.dropout, name="conv"
        )(x, train=train)
        if self.s2d_out:
            return x
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * 2, w * 2, c // 4)


class DocUFCN(nn.Module):
    """Reference DocUFCN (doc_ufcn.py:11-82). Input NHWC in [-1, 1];
    output (B, H, W, num_classes) logits.

    PRNG streams (train=True): "dropout".
    """

    num_classes: int
    input_channels: int = 3
    encoder_dropout: float = 0.4
    decoder_dropout: float = 0.4
    feature_sizes: Sequence[int] = (32, 64, 128, 256)
    pixel_shuffle: bool = False
    # Rematerialize each encoder/decoder block in the backward pass: only
    # block-boundary tensors are saved, intra-block activations are
    # recomputed during backprop. A MEMORY lever for large batch or
    # resolution — NOT a speed win at 256px/b8: the step is
    # HBM-bandwidth-bound and the recompute re-writes activations to HBM
    # (measured 0.81x, 30.2 vs 25.5 GB accessed —
    # scripts/docufcn_roofline.py).
    remat: bool = False
    # Run the first N encoder blocks in space-to-depth layout (exact, same
    # parameter tree; each block's 2x2 maxpool folds into a channelwise
    # parity max). `True` == 1 (block 0 only, the measured sweet spot:
    # train step 175.7 -> 257.1 samples/s (1.46x), eval forward 1.25x at
    # 256px/b8 — see the "Space-to-depth stem" header above and
    # MEASUREMENTS.md). Opt-in via config key `s2d_stem`.
    s2d_stem: int = 0
    # Space-to-depth decoder TAIL (exact, same parameter tree): keep the
    # last decoder block's upsample output, the encoder-0 skip concat, and
    # the 3x3 classifier in s2d layout, unpacking only the final logits.
    # The tail's full-resolution tensors (32/64/num_classes channels at
    # 256²) are the decoder-side lane-padding hotspots, the mirror image
    # of the stem's. The transpose upsample becomes ONE 1x1 conv to 4C
    # packed channels (_S2DConvTranspose2x2); the skip stays packed (under
    # `s2d_stem>=1` it already is — its depth_to_space disappears); the
    # classifier runs as a d=1 block kernel. Opt-in via config key
    # `s2d_tail`.
    s2d_tail: bool = False

    def segmenter_config(
        self,
        background_class_id: int = 0,
        min_confidence: float = 0.7,
        min_contour_area: int = 55,
    ) -> SegmenterConfig:
        return SegmenterConfig(
            num_classes=self.num_classes,
            background_class_id=background_class_id,
            min_confidence=min_confidence,
            min_contour_area=min_contour_area,
            num_input_channels=self.input_channels,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        encoder_cls = (
            nn.remat(EncoderBlock, static_argnums=(2,))
            if self.remat
            else EncoderBlock
        )
        n_s2d = int(self.s2d_stem)
        # the packed tail needs a decoder block to feed it
        s2d_tail = bool(self.s2d_tail) and len(self.feature_sizes) > 1
        skips = []
        h = x
        packed = False  # is h currently in space-to-depth layout?
        for i, features in enumerate(self.feature_sizes):
            if i > 0:
                prev_feat = self.feature_sizes[i - 1]
                # skip connection unpacks once; the pool of a packed block
                # needs no spatial op at all (channelwise parity max).
                # With the s2d tail, skip 0 (consumed by the packed last
                # decoder block) stays/becomes packed instead.
                if i == 1 and s2d_tail:
                    skips.append(h if packed else space_to_depth(h))
                else:
                    skips.append(depth_to_space(h, prev_feat) if packed else h)
                h = (
                    parity_max_pool(h)
                    if packed
                    else nn.max_pool(h, (2, 2), strides=(2, 2))
                )
                packed = False
            if i < n_s2d:
                h = space_to_depth(h)
                packed = True
            h = encoder_cls(
                features,
                dropout=self.encoder_dropout,
                s2d=packed,
                name=f"encoder_{i}",
            )(h, train)
        if packed:  # n_s2d covers every block incl. the bottom one
            h = depth_to_space(h, self.feature_sizes[-1])

        decoder_cls = (
            PixelShuffleDecoderBlock if self.pixel_shuffle else DecoderBlock
        )
        if self.remat:
            decoder_cls = nn.remat(decoder_cls, static_argnums=(2,))
        rev_features = list(reversed(self.feature_sizes))
        last = len(rev_features) - 2
        for i, (features, skip) in enumerate(
            zip(rev_features[1:], reversed(skips))
        ):
            tail = s2d_tail and i == last
            h = decoder_cls(
                features, dropout=self.decoder_dropout, s2d_out=tail,
                name=f"decoder_{i}",
            )(h, train)
            h = parity_concat(h, skip) if tail else jnp.concatenate(
                [h, skip], axis=-1
            )

        if s2d_tail:
            out = _S2DConv(self.num_classes, dilation=1, name="classifier")(h)
            return depth_to_space(out, self.num_classes)
        return nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)], name="classifier"
        )(h)


def get_doc_ufcn(version: str) -> Type[DocUFCN]:
    """Variant factory (reference doc_ufcn/__init__.py:6-15)."""
    import functools

    if version == "base":
        return DocUFCN
    if version == "no_dropout":
        return functools.partial(  # type: ignore[return-value]
            DocUFCN, encoder_dropout=0.0, decoder_dropout=0.0
        )
    if version == "pixelshuffle":
        return functools.partial(DocUFCN, pixel_shuffle=True)  # type: ignore
    raise NotImplementedError(
        f"the network you wish for is not implemented, you wished for {version}"
    )

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


class ConvBNActDrop(nn.Module):
    """conv → BatchNorm → ReLU → Dropout (reference build_conv_layer,
    doc_ufcn.py:44-51)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.4
    transpose: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
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

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, dilation in enumerate(ENCODER_DILATIONS):
            x = ConvBNActDrop(
                self.features, dilation=dilation, dropout=self.dropout,
                name=f"conv_{i}",
            )(x, train=train)
        return x


class DecoderBlock(nn.Module):
    """conv then 2x transpose-conv upsample (reference
    build_decoder_conv_block, doc_ufcn.py:63-69)."""

    features: int
    dropout: float = 0.4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBNActDrop(self.features, dropout=self.dropout, name="conv")(
            x, train=train
        )
        x = ConvBNActDrop(
            self.features, kernel_size=2, stride=2, dropout=self.dropout,
            transpose=True, name="upsample",
        )(x, train=train)
        return x


class PixelShuffleDecoderBlock(nn.Module):
    """conv to 4x features then depth-to-space (reference PixelShuffleDocUFCN,
    doc_ufcn.py:94-104; torch PixelShuffle == NHWC depth_to_space)."""

    features: int
    dropout: float = 0.4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBNActDrop(
            self.features * 4, dropout=self.dropout, name="conv"
        )(x, train=train)
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
        skips = []
        h = encoder_cls(
            self.feature_sizes[0], dropout=self.encoder_dropout, name="encoder_0"
        )(x, train)
        for i, features in enumerate(self.feature_sizes[1:], start=1):
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = encoder_cls(
                features, dropout=self.encoder_dropout, name=f"encoder_{i}"
            )(h, train)

        decoder_cls = (
            PixelShuffleDecoderBlock if self.pixel_shuffle else DecoderBlock
        )
        if self.remat:
            decoder_cls = nn.remat(decoder_cls, static_argnums=(2,))
        rev_features = list(reversed(self.feature_sizes))
        for i, (features, skip) in enumerate(
            zip(rev_features[1:], reversed(skips))
        ):
            h = decoder_cls(
                features, dropout=self.decoder_dropout, name=f"decoder_{i}"
            )(h, train)
            h = jnp.concatenate([h, skip], axis=-1)

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

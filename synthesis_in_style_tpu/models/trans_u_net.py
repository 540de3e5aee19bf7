"""TransUNet — hybrid ResNetV2 + ViT encoder with a cup decoder, TPU-native
flax.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/trans_u_net/vit_seg_modeling.py,
vit_seg_modeling_resnet_skip.py, vit_seg_configs.py), re-designed for TPU:

* **NHWC layout** throughout; attention is plain batched matmul
  (B, heads, N, d) on the MXU.
* The reference's pretrained checkpoints are the ORIGINAL JAX ViT `.npz`
  files (flax naming like `Transformer/encoderblock_0/...` — the reference
  torch code converts them at vit_seg_modeling.py:192-230, :401-449);
  `load_npz_weights` here maps them straight into this flax model,
  including the position-embedding grid resize via scipy zoom (:414-448).
* Weight-standardized convs (StdConv), GroupNorm(32) pre-activation
  bottlenecks, the zero-pad skip-size quirk of the hybrid backbone
  (vit_seg_modeling_resnet_skip.py:146-160), bilinear 2x upsampling with
  align_corners=True in the decoder (torch UpsamplingBilinear2d parity).

Config dicts mirror vit_seg_configs.py; registry `VIT_CONFIGS`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
from synthesis_in_style_tpu.models.ema_net import resize_bilinear_align_corners

Array = jax.Array


# ---------------------------------------------------------------------------
# configs (reference vit_seg_configs.py:6-127)
# ---------------------------------------------------------------------------

def get_b16_config() -> Dict[str, Any]:
    return {
        "patches": {"size": (16, 16)},
        "hidden_size": 768,
        "transformer": {
            "mlp_dim": 3072,
            "num_heads": 12,
            "num_layers": 12,
            "attention_dropout_rate": 0.0,
            "dropout_rate": 0.1,
        },
        "classifier": "seg",
        "decoder_channels": (256, 128, 64, 16),
        "n_classes": 2,
        "n_skip": 0,
        "activation": "softmax",
    }


def get_b32_config() -> Dict[str, Any]:
    config = get_b16_config()
    config["patches"] = {"size": (32, 32)}
    return config


def get_l16_config() -> Dict[str, Any]:
    config = get_b16_config()
    config["hidden_size"] = 1024
    config["transformer"] = {
        "mlp_dim": 4096,
        "num_heads": 16,
        "num_layers": 24,
        "attention_dropout_rate": 0.0,
        "dropout_rate": 0.1,
    }
    return config


def get_l32_config() -> Dict[str, Any]:
    config = get_l16_config()
    config["patches"] = {"size": (32, 32)}
    return config


def get_r50_b16_config() -> Dict[str, Any]:
    config = get_b16_config()
    config["patches"] = {"size": (16, 16), "grid": (16, 16)}
    config["resnet"] = {"num_layers": (3, 4, 9), "width_factor": 1}
    config["skip_channels"] = [512, 256, 64, 16]
    config["n_skip"] = 3
    return config


def get_r50_l16_config() -> Dict[str, Any]:
    config = get_l16_config()
    config["patches"] = {"size": (16, 16), "grid": (16, 16)}
    config["resnet"] = {"num_layers": (3, 4, 9), "width_factor": 1}
    config["skip_channels"] = [512, 256, 64, 16]
    config["n_skip"] = 3
    return config


def get_h14_config() -> Dict[str, Any]:
    """ViT-H/14 (reference vit_seg_configs.py:118-132). The reference's
    entry carries only the raw ViT fields (classifier 'token', no decoder
    keys) and would KeyError inside its own DecoderCup; we keep the ViT
    fields faithful and add the standard decoder defaults so the config is
    actually trainable here."""
    config = get_b16_config()
    config["patches"] = {"size": (14, 14)}
    config["hidden_size"] = 1280
    config["transformer"] = {
        "mlp_dim": 5120,
        "num_heads": 16,
        "num_layers": 32,
        "attention_dropout_rate": 0.0,
        "dropout_rate": 0.1,
    }
    return config


def get_testing_config() -> Dict[str, Any]:
    config = get_b16_config()
    config["hidden_size"] = 16
    config["transformer"] = {
        "mlp_dim": 32,
        "num_heads": 2,
        "num_layers": 2,
        "attention_dropout_rate": 0.0,
        "dropout_rate": 0.1,
    }
    config["decoder_channels"] = (16, 8, 4, 2)
    return config


VIT_CONFIGS = {
    "ViT-B_16": get_b16_config,
    "ViT-B_32": get_b32_config,
    "ViT-L_16": get_l16_config,
    "ViT-L_32": get_l32_config,
    "ViT-H_14": get_h14_config,
    "R50-ViT-B_16": get_r50_b16_config,
    "R50-ViT-L_16": get_r50_l16_config,
    "testing": get_testing_config,
}


# ---------------------------------------------------------------------------
# hybrid ResNetV2 backbone (reference vit_seg_modeling_resnet_skip.py)
# ---------------------------------------------------------------------------

class StdConv(nn.Conv):
    """Weight-standardized conv (reference StdConv2d :21-28): kernel is
    standardized over (kh, kw, in) per output channel at apply time."""

    def param(self, name: str, *args, **kwargs):
        p = super().param(name, *args, **kwargs)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) / jnp.sqrt(var + 1e-5)
        return p


class PreActBottleneck(nn.Module):
    """(reference PreActBottleneck :41-77) — note conv order: gn then relu
    AFTER the conv (post-act in this variant despite the name)."""

    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv(
                self.cout, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
            )(x)
            residual = nn.GroupNorm(num_groups=None, group_size=1, name="gn_proj")(
                residual
            )

        y = StdConv(self.cmid, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="gn1")(y))
        y = StdConv(
            self.cmid, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv2",
        )(y)
        y = nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="gn2")(y))
        y = StdConv(self.cout, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.GroupNorm(32, epsilon=1e-6, name="gn3")(y)
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    """(reference ResNetV2 :116-161). Returns (features, skip list in
    decoder order)."""

    block_units: Sequence[int]
    width_factor: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        width = int(64 * self.width_factor)
        b, in_size = x.shape[0], x.shape[1]

        x = StdConv(
            width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, name="root_conv",
        )(x)
        x = nn.relu(nn.GroupNorm(32, epsilon=1e-6, name="root_gn")(x))
        features = [x]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        widths = [(width, width * 4), (width * 2, width * 8), (width * 4, width * 16)]
        for i, (n_units, (cmid, cout)) in enumerate(zip(self.block_units, widths)):
            stride = 1 if i == 0 else 2
            x = PreActBottleneck(
                cout, cmid, stride=stride, name=f"block{i + 1}_unit1"
            )(x)
            for u in range(2, n_units + 1):
                x = PreActBottleneck(cout, cmid, name=f"block{i + 1}_unit{u}")(x)
            if i < len(self.block_units) - 1:
                # skip features, zero-padded to the expected size (reference
                # :146-158 quirk)
                right_size = int(in_size / 4 / (i + 1))
                if x.shape[1] != right_size:
                    pad_h = right_size - x.shape[1]
                    pad_w = right_size - x.shape[2]
                    assert 0 < pad_h < 3, f"x {x.shape} should {right_size}"
                    feat = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                else:
                    feat = x
                features.append(feat)
        return x, features[::-1]


# ---------------------------------------------------------------------------
# transformer encoder (reference vit_seg_modeling.py:53-263)
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    """Multi-head self-attention (reference vit_seg_modeling.py:53-89).

    ``impl`` selects the lowering — the parameter tree and outputs are
    identical either way:

    * ``"xla"`` (default): materialized scores + softmax as batched matmuls.
      Simple, runs on any backend, but writes the (B, heads, N, N)
      attention matrix to HBM — at 512px (N=1024 tokens) that tensor is
      the dominant HBM traffic of the whole train step.
    * ``"flash"``: the tiled online-softmax Pallas TPU kernel
      (jax.experimental.pallas.ops.tpu.flash_attention) — score tiles live
      in VMEM and the N x N matrix never touches HBM; differentiable via
      its bundled custom-VJP kernels. Requires a TPU backend, token count
      a multiple of 128, and attention_dropout_rate == 0 (the kernel has
      no prob-dropout; every shipped VIT_CONFIG uses 0.0).
    """

    num_heads: int
    dropout_rate: float = 0.0
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = x.shape[-1]
        head_dim = hidden // self.num_heads
        q = nn.Dense(hidden, name="query")(x)
        k = nn.Dense(hidden, name="key")(x)
        v = nn.Dense(hidden, name="value")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.impl == "flash":
            n_tokens = x.shape[1]
            if self.dropout_rate > 0.0:
                raise ValueError(
                    "attention_impl='flash' does not support "
                    "attention_dropout_rate > 0 (probability dropout happens "
                    "inside the fused kernel's softmax); use 'xla'."
                )
            if n_tokens % 128 != 0:
                raise ValueError(
                    f"attention_impl='flash' needs the token count to be a "
                    f"multiple of 128, got {n_tokens} (image size must be a "
                    f"multiple of 16*128**0.5 ≈ 192px for square grids); "
                    f"use 'xla'."
                )
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            context = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                sm_scale=1.0 / math.sqrt(head_dim),
            ).transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(
                self.dropout_rate, deterministic=not train
            )(probs)
            context = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        context = context.reshape(x.shape[0], x.shape[1], hidden)
        out = nn.Dense(hidden, name="out")(context)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(out)


class Mlp(nn.Module):
    mlp_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="fc1",
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6))(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(hidden, name="fc2",
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6))(x)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class Block(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = x
        x = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(x)
        x = Attention(
            self.num_heads, self.attention_dropout_rate,
            impl=self.attention_impl, name="attn",
        )(x, train=train)
        x = x + h
        h = x
        x = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        x = Mlp(self.mlp_dim, self.dropout_rate, name="ffn")(x, train=train)
        return x + h


# ---------------------------------------------------------------------------
# decoder (reference vit_seg_modeling.py:265-374)
# ---------------------------------------------------------------------------

class Conv2dReLU(nn.Module):
    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None,
                 train: bool = False) -> Array:
        x = resize_bilinear_align_corners(x, x.shape[1] * 2, x.shape[2] * 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.features, name="conv1")(x, train=train)
        x = Conv2dReLU(self.features, name="conv2")(x, train=train)
        return x


class VisionTransformer(nn.Module):
    """Reference VisionTransformer (vit_seg_modeling.py:376-455). Input NHWC
    (1 or 3 channels) in [-1, 1]; output (B, H, W, num_classes) logits."""

    config: Any  # one of VIT_CONFIGS (dict)
    img_size: int = 224
    num_classes: int = 2

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

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 capture: Optional[dict] = None) -> Array:
        # `capture`: per-stage outputs for scripts/seg_stage_bisect.py
        # (XLA DCE makes "loss of stage k" an exact prefix program)
        config = self.config
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)

        hidden_size = config["hidden_size"]
        tconf = config["transformer"]
        img_size = x.shape[1]

        # ---- embeddings (reference Embeddings :125-169) ----
        features = None
        if config["patches"].get("grid") is not None:
            grid = config["patches"]["grid"]
            patch = (img_size // 16 // grid[0], img_size // 16 // grid[1])
            patch = (max(1, patch[0]), max(1, patch[1]))
            x, features = ResNetV2(
                config["resnet"]["num_layers"],
                config["resnet"]["width_factor"],
                name="hybrid_model",
            )(x)
            if capture is not None:
                capture["r50_stem"] = x
        else:
            patch = config["patches"]["size"]
        x = nn.Conv(
            hidden_size, patch, strides=patch, padding="VALID",
            name="patch_embeddings",
        )(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, hidden_size)
        pos_emb = self.param(
            "position_embeddings",
            nn.initializers.zeros,
            (1, gh * gw, hidden_size),
        )
        x = x + pos_emb
        x = nn.Dropout(tconf["dropout_rate"], deterministic=not train)(x)
        if capture is not None:
            capture["embeddings"] = x

        # ---- encoder ----
        for i in range(tconf["num_layers"]):
            x = Block(
                tconf["num_heads"],
                tconf["mlp_dim"],
                tconf["dropout_rate"],
                tconf["attention_dropout_rate"],
                attention_impl=config.get("attention_impl", "xla"),
                name=f"encoderblock_{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(x)
        if capture is not None:
            capture["encoder"] = x

        # ---- decoder cup (reference DecoderCup :331-374) ----
        h = w = int(math.sqrt(x.shape[1]))
        x = x.reshape(b, h, w, hidden_size)
        x = Conv2dReLU(512, name="conv_more")(x, train=train)

        decoder_channels = config["decoder_channels"]
        n_skip = config.get("n_skip", 0)
        skip_channels = list(config.get("skip_channels", [0, 0, 0, 0]))
        for i in range(4 - n_skip):
            skip_channels[3 - i] = 0
        for i, ch in enumerate(decoder_channels):
            skip = None
            if features is not None and i < n_skip and skip_channels[i] != 0:
                skip = features[i]
            x = DecoderBlock(ch, name=f"decoder_block_{i}")(x, skip, train=train)
            if capture is not None:
                capture[f"decoder_{i}"] = x

        # ---- segmentation head (reference :324-329) ----
        out = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            name="segmentation_head",
        )(x)
        if capture is not None:
            capture["head"] = out
        return out


# ---------------------------------------------------------------------------
# pretrained .npz loading (reference load_from, vit_seg_modeling.py:401-449)
# ---------------------------------------------------------------------------

def load_npz_weights(params: Dict, weights: Dict[str, np.ndarray],
                     config: Dict) -> Dict:
    """Merge original JAX ViT `.npz` weights into this model's params pytree.
    Returns a new params dict. The npz naming is the flax-era ViT layout the
    reference converts to torch (vit_seg_modeling.py:28-36, :192-230)."""
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    hidden = config["hidden_size"]

    params["patch_embeddings"]["kernel"] = weights["embedding/kernel"]
    params["patch_embeddings"]["bias"] = weights["embedding/bias"]
    params["encoder_norm"]["scale"] = weights["Transformer/encoder_norm/scale"]
    params["encoder_norm"]["bias"] = weights["Transformer/encoder_norm/bias"]

    # position embeddings with optional grid resize (:414-448)
    posemb = weights["Transformer/posembed_input/pos_embedding"]
    posemb_new = params["position_embeddings"]
    if posemb.shape == posemb_new.shape:
        params["position_embeddings"] = posemb
    elif posemb.shape[1] - 1 == posemb_new.shape[1]:
        params["position_embeddings"] = posemb[:, 1:]
    else:
        from scipy import ndimage

        ntok_new = posemb_new.shape[1]
        posemb_grid = posemb[0, 1:] if posemb.shape[1] % 2 else posemb[0]
        gs_old = int(np.sqrt(len(posemb_grid)))
        gs_new = int(np.sqrt(ntok_new))
        posemb_grid = posemb_grid.reshape(gs_old, gs_old, -1)
        zoom = (gs_new / gs_old, gs_new / gs_old, 1)
        posemb_grid = ndimage.zoom(posemb_grid, zoom, order=1)
        params["position_embeddings"] = posemb_grid.reshape(1, gs_new * gs_new, -1)

    n_layers = config["transformer"]["num_layers"]
    for i in range(n_layers):
        root = f"Transformer/encoderblock_{i}"
        block = params[f"encoderblock_{i}"]
        attn = block["attn"]
        for mine, theirs in (("query", "query"), ("key", "key"),
                             ("value", "value")):
            attn[mine]["kernel"] = weights[
                f"{root}/MultiHeadDotProductAttention_1/{theirs}/kernel"
            ].reshape(hidden, hidden)
            attn[mine]["bias"] = weights[
                f"{root}/MultiHeadDotProductAttention_1/{theirs}/bias"
            ].reshape(-1)
        attn["out"]["kernel"] = weights[
            f"{root}/MultiHeadDotProductAttention_1/out/kernel"
        ].reshape(hidden, hidden)
        attn["out"]["bias"] = weights[
            f"{root}/MultiHeadDotProductAttention_1/out/bias"
        ].reshape(-1)
        block["ffn"]["fc1"]["kernel"] = weights[f"{root}/MlpBlock_3/Dense_0/kernel"]
        block["ffn"]["fc1"]["bias"] = weights[f"{root}/MlpBlock_3/Dense_0/bias"]
        block["ffn"]["fc2"]["kernel"] = weights[f"{root}/MlpBlock_3/Dense_1/kernel"]
        block["ffn"]["fc2"]["bias"] = weights[f"{root}/MlpBlock_3/Dense_1/bias"]
        block["attention_norm"]["scale"] = weights[f"{root}/LayerNorm_0/scale"]
        block["attention_norm"]["bias"] = weights[f"{root}/LayerNorm_0/bias"]
        block["ffn_norm"]["scale"] = weights[f"{root}/LayerNorm_2/scale"]
        block["ffn_norm"]["bias"] = weights[f"{root}/LayerNorm_2/bias"]

    if "hybrid_model" in params:
        hybrid = params["hybrid_model"]
        hybrid["root_conv"]["kernel"] = weights["conv_root/kernel"]
        hybrid["root_gn"]["scale"] = weights["gn_root/scale"].reshape(-1)
        hybrid["root_gn"]["bias"] = weights["gn_root/bias"].reshape(-1)
        for name, unit in hybrid.items():
            if not name.startswith("block"):
                continue
            block_name, unit_name = name.split("_")  # blockN, unitM
            root = f"{block_name}/{unit_name}"
            for conv in ("conv1", "conv2", "conv3"):
                unit[conv]["kernel"] = weights[f"{root}/{conv}/kernel"]
            for gn in ("gn1", "gn2", "gn3"):
                unit[gn]["scale"] = weights[f"{root}/{gn}/scale"].reshape(-1)
                unit[gn]["bias"] = weights[f"{root}/{gn}/bias"].reshape(-1)
            if "downsample" in unit:
                unit["downsample"]["kernel"] = weights[f"{root}/conv_proj/kernel"]
                unit["gn_proj"]["scale"] = weights[f"{root}/gn_proj/scale"].reshape(-1)
                unit["gn_proj"]["bias"] = weights[f"{root}/gn_proj/bias"].reshape(-1)
    return params

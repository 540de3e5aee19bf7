"""InceptionV3 pool3 feature extractor for FID — flax NHWC port.

The reference computes FID with pytorch_fid's pretrained InceptionV3
(/root/reference/stylegan_code_finder/evaluation/fid.py:37-41). This module
ports the architecture (torchvision inception_v3 feature path to the 2048-d
global-average pool, with pytorch_fid's count_include_pad=False average
pools) and a `load_torch_inception_v3` converter for torchvision/pytorch_fid
state dicts. ImageNet weights cannot be downloaded in this image — supply
them via the converter for calibrated FID values; random init preserves the
architecture capability only.

Input convention (pytorch_fid parity): NHWC float images in [-1, 1],
bilinearly resized to 299x299 by `preprocess`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def avg_pool_no_pad(x: Array, window: int = 3) -> Array:
    """3x3 stride-1 average pool with count_include_pad=False (pytorch_fid's
    FIDInception blocks)."""
    pad = window // 2
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return summed / counts


class BasicConv(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            use_bias=False, name="conv",
        )(x)
        # inference-only: running stats folded as (x - mean) / sqrt(var+eps)
        x = nn.BatchNorm(use_running_average=True, epsilon=0.001, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_no_pad(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_no_pad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # pytorch_fid's E_2 uses max pool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=[(1, 1), (1, 1)])
        else:
            bp = avg_pool_no_pad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Feature path to the 2048-d pooled embedding (pytorch_fid block 3)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def preprocess(images: Array) -> Array:
    """[-1, 1] NHWC -> 299x299 (pytorch_fid resizes bilinearly)."""
    b, h, w, c = images.shape
    if (h, w) != (299, 299):
        images = jax.image.resize(images, (b, 299, 299, c), method="bilinear")
    return images


def init_inception(seed: int = 0):
    model = InceptionV3Features()
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, 299, 299, 3))
    )
    return model, variables


def make_inception_feature_fn(variables=None, seed: int = 0):
    """feature_fn for evaluation.fid.FID: images in [-1,1] -> (B, 2048)."""
    model = InceptionV3Features()
    if variables is None:
        _, variables = init_inception(seed)

    @jax.jit
    def feature_fn(images: Array) -> Array:
        return model.apply(variables, preprocess(images))

    return feature_fn


def load_torch_inception_v3(state_dict: Dict[str, Any]) -> Dict:
    """torchvision/pytorch_fid inception_v3 state dict -> flax variables.
    Conv: (out,in,kh,kw)->(kh,kw,in,out); BN running stats into batch_stats."""
    import numpy as np

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def visit(prefix_torch: str, tree_path: List[str]):
        w = state_dict.get(f"{prefix_torch}.conv.weight")
        if w is None:
            return False
        node_p = params
        node_s = batch_stats
        for part in tree_path[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        leaf = tree_path[-1]
        node_p[leaf] = {
            "conv": {"kernel": np.asarray(w).transpose(2, 3, 1, 0)},
            "bn": {
                "scale": np.asarray(state_dict[f"{prefix_torch}.bn.weight"]),
                "bias": np.asarray(state_dict[f"{prefix_torch}.bn.bias"]),
            },
        }
        node_s[leaf] = {
            "bn": {
                "mean": np.asarray(
                    state_dict[f"{prefix_torch}.bn.running_mean"]
                ),
                "var": np.asarray(state_dict[f"{prefix_torch}.bn.running_var"]),
            }
        }
        return True

    # stem convs
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        visit(name, [name])
    # mixed blocks: walk every BasicConv submodule by torch key
    prefixes = sorted(
        {
            key.rsplit(".conv.weight", 1)[0]
            for key in state_dict
            if key.endswith(".conv.weight") and key.startswith("Mixed_")
        }
    )
    for prefix in prefixes:
        visit(prefix, prefix.split("."))
    return {"params": params, "batch_stats": batch_stats}

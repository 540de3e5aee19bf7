"""Static w8a8 PTQ serving path for DocUFCN — int8 tensors flow between layers.

Why static, not dynamic: the DocUFCN eval forward is HBM-bandwidth-bound
(~91% of the v5e roofline, MEASUREMENTS.md "DocUFCN roofline"), so the
generator's dynamic w8a8 scheme (ops/quant.py conv2d_w8a8) would LOSE here —
its per-sample abs-max is a reduction over each conv's output, forcing an
extra full-tensor read+write pass per layer that costs more bandwidth than
the int8 operand read saves. With scales calibrated offline:

* every requantize is a pure elementwise epilogue XLA fuses into the
  producing conv — only int8 crosses HBM between layers (half the bf16
  traffic, quarter of f32);
* activation scales are per-channel and folded into the weights before
  weight quantization (ops/quant.py quantize_weight_folded) — exact, zero
  runtime ops, and it makes the decoder's skip-concats (two tensors with
  different scales) feed ONE int8 conv;
* ALL weight quantization and the bias+BatchNorm epilogue folding happen
  ONCE at pack time (`pack_quant`) — the serving program's arguments are
  the packed int8 weights plus two f32 per-channel vectors per layer, so
  the jitted forward contains no weight abs-max/round work at all
  (an earlier in-jit variant re-quantized all 23 weight tensors per call
  and measured SLOWER than bf16 end-to-end despite per-conv int8 wins of
  1.6-2.2x);
* the 2x2/stride-2 transpose-conv upsamples are reformulated as a 1x1
  int8 conv to 4F channels + depth_to_space (exact: with k == s == 2 every
  output pixel receives exactly one — spatially flipped — kernel tap),
  which runs as a plain MXU int8 matmul instead of the lhs-dilated path
  that measured no int8 win.

The first conv runs in bf16 (it reads the 3-channel image — negligible
traffic) and the classifier conv emits f32 logits (no requantize), so the
quantized region is exactly the bandwidth-bound interior. BatchNorm
(running stats) + ReLU live in the f32 epilogue between the int32
accumulator and the int8 requantize — numerics match the float path up to
int8 rounding.

This is a serving-only transform over the UNCHANGED flax module/params
(models/doc_ufcn.py): `calibrate(...)` runs the float model once over
representative batches and records per-channel abs-max per ConvBNActDrop;
`pack_quant(...)` folds scales/weights/BN; `quantized_forward(...)` then
mirrors `DocUFCN.__call__` functionally. Equivalence vs the float path is
pinned in tests/test_quantized_docufcn.py.

Measured outcome (v5e, 256px, batch 8, MEASUREMENTS.md "DocUFCN serving
dtype"): w8a8 13.84 ms vs f32 14.75 ms (+7%) vs a plain bf16 param cast
13.05 ms (+13%). Per-conv int8 wins of 1.6-2.2x do NOT compound here
because the DocUFCN convs are SHAPE-limited — 32/64 input channels pad to
the 128-lane MXU, so the conv cost is fixed by the padded tile work, not
by operand bytes, and TPU HLO materializes each conv's s32 accumulator in
HBM between the conv and its epilogue fusion (4 B/elem written + re-read),
eating most of the int8 read savings. Kept as an opt-in with honest
numbers; `AnalysisSegmenter(serving_dtype="bfloat16")` is the simpler,
slightly faster, higher-fidelity production choice.

The reference has no quantized inference (torch fp32,
/root/reference/stylegan_code_finder/networks/doc_ufcn/doc_ufcn.py); this is
a beyond-parity serving mode, opt-in via ``quantize: true`` /
``AnalysisSegmenter(quantized=True)``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict

from synthesis_in_style_tpu.models.doc_ufcn import (
    ENCODER_DILATIONS,
    ConvBNActDrop,
    DecoderBlock,
    DocUFCN,
    PixelShuffleDecoderBlock,
)
from synthesis_in_style_tpu.ops.quant import (
    int8_conv,
    quantize_weight_folded,
    requantize,
    scale_from_amax,
)

Array = jax.Array
_BN_EPS = 1e-5  # flax nn.BatchNorm default, as used by ConvBNActDrop


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

def _is_scale_site(mdl, method_name: str) -> bool:
    return method_name == "__call__" and isinstance(
        mdl, (ConvBNActDrop, DecoderBlock, PixelShuffleDecoderBlock)
    )


def calibrate(
    model: DocUFCN,
    variables: Any,
    batches: Sequence[Array],
) -> Dict[str, np.ndarray]:
    """Run the float model over calibration batches and return per-site
    per-channel abs-max: {module_path: (C,) f32}.

    `batches` are normalized float inputs (same domain as `model.apply`).
    Sites are every ConvBNActDrop output plus each decoder block output
    (the post-upsample tensor whose scale the skip-concat consumer needs).
    """
    amax: Dict[str, np.ndarray] = {}
    for batch in batches:
        _, state = model.apply(
            variables,
            jnp.asarray(batch),
            train=False,
            capture_intermediates=_is_scale_site,
            mutable=["intermediates"],
        )
        flat = jax.tree_util.tree_flatten_with_path(
            state["intermediates"]
        )[0]
        for path, value in flat:
            keys = [
                p.key for p in path if isinstance(p, jax.tree_util.DictKey)
            ]
            # drop the trailing "__call__" key; index keys (tuple entries
            # of the sow) don't appear as DictKeys
            name = "/".join(k for k in keys if k != "__call__")
            per_channel = np.asarray(
                jnp.max(jnp.abs(value.astype(jnp.float32)), axis=(0, 1, 2))
            )
            prev = amax.get(name)
            amax[name] = (
                per_channel if prev is None else np.maximum(prev, per_channel)
            )
    return amax


def quant_scales_from_amax(amax: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """abs-max -> per-channel int8 scales (f32), zero-safe."""
    return {k: scale_from_amax(jnp.asarray(v)) for k, v in amax.items()}


# ---------------------------------------------------------------------------
# pack: fold scales + BN into static int8 weights and f32 epilogue vectors
# ---------------------------------------------------------------------------

def _bn_affine(p_bn: Any, s_bn: Any) -> Tuple[Array, Array]:
    """Eval-mode BatchNorm as (mul, add) per channel, f32."""
    mean = s_bn["mean"].astype(jnp.float32)
    var = s_bn["var"].astype(jnp.float32)
    gamma = p_bn["scale"].astype(jnp.float32)
    beta = p_bn["bias"].astype(jnp.float32)
    inv = gamma * jax.lax.rsqrt(var + _BN_EPS)
    return inv, beta - mean * inv


def _pack_conv_site(
    params: Any, stats: Any, s_in: Array, s_out: Optional[Array]
) -> Dict[str, Array]:
    """One ConvBNActDrop: int8 weight (input scales folded) + folded
    epilogue so the runtime chain is
    ``relu(acc_i32 * mul + add)`` then optional requantize by ``s_out``."""
    w_q, s_w = quantize_weight_folded(params["conv"]["kernel"], s_in)
    bn_mul, bn_add = _bn_affine(params["bn"], stats["bn"])
    site = {
        "w_q": w_q,
        "mul": s_w * bn_mul,
        "add": params["conv"]["bias"].astype(jnp.float32) * bn_mul + bn_add,
    }
    if s_out is not None:
        site["s_out"] = jnp.broadcast_to(
            jnp.asarray(s_out, jnp.float32), site["mul"].shape
        )
    return site


def _pack_transpose_up(
    params: Any, stats: Any, s_in: Array, s_out: Array
) -> Dict[str, Array]:
    """2x2/stride-2 ConvTranspose as 1x1 int8 conv to 4F + depth_to_space.

    Exact reformulation: flax ConvTranspose computes
    ``out[2i+a, 2j+b, o] = sum_c x[i,j,c] * K[1-a, 1-b, c, o]`` (spatially
    flipped taps — pinned in tests/test_quantized_docufcn.py), so with the
    flipped kernel laid out as (a, b, o) channels (o fastest) the
    depth_to_space scatter reproduces it exactly. Per-output-channel
    epilogue vectors are shared across the 4 taps (tiled)."""
    kernel = params["conv"]["kernel"]  # (2, 2, C, F) HWIO
    kh, kw, c_in, feat = kernel.shape
    assert kh == 2 and kw == 2, kernel.shape
    w1 = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(1, 1, c_in, 4 * feat)
    w_q, s_w = quantize_weight_folded(w1, s_in)
    bn_mul, bn_add = _bn_affine(params["bn"], stats["bn"])
    return {
        "w_q": w_q,
        "mul": s_w * jnp.tile(bn_mul, 4),
        "add": jnp.tile(
            params["conv"]["bias"].astype(jnp.float32) * bn_mul + bn_add, 4
        ),
        "s_out": jnp.tile(
            jnp.broadcast_to(jnp.asarray(s_out, jnp.float32), (feat,)), 4
        ),
    }


def pack_quant(
    model: DocUFCN, variables: Any, scales: Dict[str, Array]
) -> Dict[str, Any]:
    """Fold the calibrated scales, float weights, conv biases and BatchNorm
    running stats into the static serving tree consumed by
    `quantized_forward`. Mirrors the forward's scale propagation, including
    the decoder skip-concat input scales."""
    if isinstance(variables, FrozenDict):
        variables = variables.unfreeze()
    params = variables["params"]
    stats = variables["batch_stats"]
    packed: Dict[str, Any] = {}

    def site_scale(name: str) -> Array:
        return jnp.asarray(scales[name], jnp.float32)

    # encoder_0/conv_0 stays float; record only its output scale
    s = site_scale("encoder_0/conv_0")
    packed["encoder_0/conv_0"] = {"s_out": s}
    for i in range(1, len(ENCODER_DILATIONS)):
        name = f"encoder_0/conv_{i}"
        s_next = site_scale(name)
        packed[name] = _pack_conv_site(
            params["encoder_0"][f"conv_{i}"],
            stats["encoder_0"][f"conv_{i}"],
            s,
            s_next,
        )
        s = s_next

    skip_scales: List[Array] = []
    for blk, _features in enumerate(model.feature_sizes[1:], start=1):
        skip_scales.append(s)
        for i in range(len(ENCODER_DILATIONS)):
            name = f"encoder_{blk}/conv_{i}"
            s_next = site_scale(name)
            packed[name] = _pack_conv_site(
                params[f"encoder_{blk}"][f"conv_{i}"],
                stats[f"encoder_{blk}"][f"conv_{i}"],
                s,
                s_next,
            )
            s = s_next

    rev_features = list(reversed(list(model.feature_sizes)))
    for i, (feat, skip_s) in enumerate(
        zip(rev_features[1:], reversed(skip_scales))
    ):
        dp = params[f"decoder_{i}"]
        ds = stats[f"decoder_{i}"]
        s_blk = jnp.broadcast_to(site_scale(f"decoder_{i}"), (feat,))
        if model.pixel_shuffle:
            # conv straight to 4F channels (BN+ReLU pre-d2s); the block
            # output scale is shared across the 4 taps
            packed[f"decoder_{i}/conv"] = _pack_conv_site(
                dp["conv"], ds["conv"], s, jnp.tile(s_blk, 4)
            )
        else:
            s_mid = site_scale(f"decoder_{i}/conv")
            packed[f"decoder_{i}/conv"] = _pack_conv_site(
                dp["conv"], ds["conv"], s, s_mid
            )
            packed[f"decoder_{i}/upsample"] = _pack_transpose_up(
                dp["upsample"], ds["upsample"], s_mid, s_blk
            )
        skip_c = skip_s.shape[0] if jnp.ndim(skip_s) else feat
        s = jnp.concatenate(
            [s_blk, jnp.broadcast_to(skip_s, (skip_c,))]
        )

    w_q, s_w = quantize_weight_folded(params["classifier"]["kernel"], s)
    packed["classifier"] = {
        "w_q": w_q,
        "mul": s_w,
        "add": params["classifier"]["bias"].astype(jnp.float32),
    }
    # materialize now so serving never re-runs the fold
    return jax.tree_util.tree_map(
        lambda t: jax.device_put(jnp.asarray(t)), packed
    )


# ---------------------------------------------------------------------------
# quantized forward
# ---------------------------------------------------------------------------

def _epilogue(site: Dict[str, Array], acc: Array) -> Array:
    """int32 accumulator -> relu(acc * mul + add), then requantize to int8
    when the site carries an output scale (the classifier doesn't). All
    elementwise — XLA fuses the chain into the producing conv."""
    y = acc.astype(jnp.float32) * site["mul"] + site["add"]
    if "s_out" not in site:
        return y
    return requantize(jax.nn.relu(y), site["s_out"])


def _qconv(site: Dict[str, Array], x_q: Array, dilation: int = 1) -> Array:
    acc = int8_conv(
        x_q, site["w_q"], padding=dilation, rhs_dilation=(dilation, dilation)
    )
    return _epilogue(site, acc)


def _depth_to_space_int8(q4: Array, feat: int) -> Array:
    b, h, w, _ = q4.shape
    q4 = q4.reshape(b, h, w, 2, 2, feat).transpose(0, 1, 3, 2, 4, 5)
    return q4.reshape(b, h * 2, w * 2, feat)


def quantized_forward(
    model: DocUFCN,
    variables: Any,
    quant: Dict[str, Any],
    x: Array,
) -> Array:
    """w8a8 static-PTQ eval forward mirroring DocUFCN.__call__ (train=False).

    `x` is the normalized float input (same domain as model.apply); returns
    (B, H, W, num_classes) f32 logits. `quant` from `pack_quant(...)` —
    the only pieces read from `variables` are the first conv's float
    weights/BN (it runs in bf16 on the 3-channel image).
    """
    if isinstance(variables, FrozenDict):
        variables = variables.unfreeze()
    params = variables["params"]
    stats = variables["batch_stats"]
    compute = jnp.bfloat16

    # ---- encoder_0/conv_0: bf16 conv, f32 epilogue, requantize to int8
    p0 = params["encoder_0"]["conv_0"]
    s0 = stats["encoder_0"]["conv_0"]
    h = jax.lax.conv_general_dilated(
        x.astype(compute),
        p0["conv"]["kernel"].astype(compute),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    mul, add = _bn_affine(p0["bn"], s0["bn"])
    y0 = jax.nn.relu(
        (h.astype(jnp.float32) + p0["conv"]["bias"].astype(jnp.float32))
        * mul
        + add
    )
    q = requantize(y0, quant["encoder_0/conv_0"]["s_out"])
    for i, dilation in list(enumerate(ENCODER_DILATIONS))[1:]:
        q = _qconv(quant[f"encoder_0/conv_{i}"], q, dilation)

    skips: List[Array] = []
    for blk, _features in enumerate(model.feature_sizes[1:], start=1):
        skips.append(q)
        # max-pool directly on int8: scales are positive per channel, so
        # max commutes with dequantization
        q = jax.lax.reduce_window(
            q,
            jnp.array(-128, q.dtype),
            jax.lax.max,
            (1, 2, 2, 1),
            (1, 2, 2, 1),
            "VALID",
        )
        for i, dilation in enumerate(ENCODER_DILATIONS):
            q = _qconv(quant[f"encoder_{blk}/conv_{i}"], q, dilation)

    rev_features = list(reversed(list(model.feature_sizes)))
    for i, (feat, skip_q) in enumerate(zip(rev_features[1:], reversed(skips))):
        if model.pixel_shuffle:
            q = _qconv(quant[f"decoder_{i}/conv"], q)
            q = _depth_to_space_int8(q, feat)
        else:
            q = _qconv(quant[f"decoder_{i}/conv"], q)
            up = quant[f"decoder_{i}/upsample"]
            q = _depth_to_space_int8(_epilogue(up, int8_conv(q, up["w_q"])), feat)
        q = jnp.concatenate([q, skip_q], axis=-1)

    # classifier: int8 input (scales folded into the weight), f32 logits
    cls = quant["classifier"]
    return _epilogue(cls, int8_conv(q, cls["w_q"], padding=1))


# ---------------------------------------------------------------------------
# serving adapter
# ---------------------------------------------------------------------------

class QuantizedDocUFCN:
    """Duck-typed drop-in for the (network, variables) pair the serving
    stack passes around: exposes `.apply(variables, x, train=False)` with
    the same signature as a flax module, running the w8a8 forward.

    Built by `quantize_for_serving`; `variables` must carry a "quant"
    collection (the packed int8 weights + epilogue vectors from
    `pack_quant`) alongside params/batch_stats.
    """

    def __init__(self, model: DocUFCN):
        self.model = model
        # mirrored attributes some call-sites read off the module
        self.num_classes = model.num_classes
        self.input_channels = model.input_channels

    def segmenter_config(self, *args, **kwargs):
        return self.model.segmenter_config(*args, **kwargs)

    def apply(self, variables: Any, x: Array, train: bool = False, **_: Any):
        assert not train, "w8a8 PTQ is a serving-only path"
        if isinstance(variables, FrozenDict):
            variables = variables.unfreeze()
        return quantized_forward(self.model, variables, variables["quant"], x)


def quantize_for_serving(
    model: DocUFCN,
    variables: Any,
    calibration_batches: Sequence[Array],
) -> Tuple[QuantizedDocUFCN, Any]:
    """Calibrate on representative normalized batches and return the
    (network, variables) serving pair with the packed quant tree attached
    under "quant"."""
    if model.s2d_stem or model.s2d_tail:
        # The s2d flags are pure re-lowerings over the SAME parameter tree
        # (models/doc_ufcn.py), but calibrate()/pack_quant() mirror the
        # unpacked forward: calibrating an s2d model would record packed
        # 4C-channel ranges that the fold cannot consume. Quantized serving
        # therefore runs the (numerically identical) unpacked lowering —
        # the int8 layout removes the lane-padding traffic s2d targets.
        import dataclasses

        model = dataclasses.replace(model, s2d_stem=0, s2d_tail=False)
    amax = calibrate(model, variables, calibration_batches)
    scales = quant_scales_from_amax(amax)
    quant = pack_quant(model, variables, scales)
    if isinstance(variables, FrozenDict):
        variables = variables.unfreeze()
    new_vars = dict(variables)
    new_vars["quant"] = quant
    return QuantizedDocUFCN(model), new_vars

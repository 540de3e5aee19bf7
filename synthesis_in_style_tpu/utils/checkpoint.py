"""Checkpoint IO: orbax pytree snapshots + torch<->flax weight conversion.

* Snapshots are orbax StandardCheckpointer directories keyed by the
  reference's logical names (`generator`, `discriminator`, `g_ema`,
  `segmentation_network`, ... — reference Snapshotter usage,
  train_stylegan_2.py:154-165), written by `core.extensions.Snapshotter`.
* `torch_generator_to_flax` / `flax_generator_to_torch` convert StyleGAN2 /
  SWAGAN generator weights between the reference torch layout
  (networks/stylegan2/model.py, networks/swagan/model.py; torch key names
  like `style.1.weight`, `convs.0.conv.weight`, `noises.noise_3`) and this
  package's flax NHWC layout (see models/stylegan2.py module docstring for
  the per-tensor layout table). Conversion rules:
    linear weight:      torch (out, in)            -> flax (in, out)
    conv weight:        torch (out, in, kh, kw)    -> flax (kh, kw, in, out)
    modulated conv:     torch (1, out, in, kh, kw) -> flax (kh, kw, in, out)
    constant input:     torch (1, C, 4, 4)         -> flax (1, 4, 4, C)
    noise buffers:      torch (1, 1, H, W)         -> flax (1, H, W, 1)
    ToRGB bias:         torch (1, C, 1, 1)         -> flax (C,)
* `torch_discriminator_to_flax` additionally reorders the final linear's
  input columns from the torch NCHW flatten (c*16 + y*4 + x) to the flax
  NHWC flatten (y*4*C + x*C + c).

Loading a reference `.pt` requires torch (present in this image, CPU-only).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np


# ---------------------------------------------------------------------------
# orbax snapshots
# ---------------------------------------------------------------------------

def save_pytree(path: Union[str, Path], tree: Any) -> None:
    import jax
    import orbax.checkpoint as ocp

    tree = jax.tree_util.tree_map(np.asarray, tree)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).resolve(), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: Union[str, Path]) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve())


def restore_structured(ref: Any, loaded: Any) -> Any:
    """Rebuild `ref`'s pytree structure (namedtuples, tuples, dicts — e.g.
    an optax state chain) from an orbax-restored tree of plain dicts/lists.

    Namedtuple fields are matched BY NAME (orbax stores them as dicts keyed
    by field name), not by sorted-leaf order — an optimizer whose field
    order differs from alphabetical dict order, or a chain with >10 stages
    ('10' sorts before '2'), restores correctly. Leaf shapes are asserted
    against their destinations."""
    import jax.numpy as jnp

    if loaded is None:
        # orbax stores empty containers (e.g. optax.EmptyState) as None
        return ref
    if isinstance(ref, tuple) and hasattr(ref, "_fields"):  # namedtuple
        if isinstance(loaded, dict):
            return type(ref)(
                **{
                    f: restore_structured(getattr(ref, f), loaded[f])
                    for f in ref._fields
                }
            )
        return type(ref)(
            *(restore_structured(r, l) for r, l in zip(ref, loaded))
        )
    if isinstance(ref, (tuple, list)):
        if isinstance(loaded, dict):  # {"0": ..., "1": ...} style
            seq = [loaded[str(i)] for i in range(len(ref))]
        else:
            seq = list(loaded)
        assert len(seq) == len(ref), (len(seq), len(ref))
        out = [restore_structured(r, l) for r, l in zip(ref, seq)]
        return type(ref)(out) if isinstance(ref, list) else tuple(out)
    if isinstance(ref, dict):
        return {k: restore_structured(v, loaded[k]) for k, v in ref.items()}
    leaf = jnp.asarray(loaded)
    ref_shape = getattr(ref, "shape", None)
    if ref_shape is not None:
        assert leaf.shape == tuple(ref_shape), (leaf.shape, ref_shape)
    return leaf


def latest_snapshot(checkpoint_dir: Union[str, Path]) -> Optional[Path]:
    """Newest `iter_XXXXXXXX` snapshot in a checkpoints dir."""
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.exists():
        return None
    snaps = sorted(checkpoint_dir.glob("iter_*"))
    return snaps[-1] if snaps else None


def snapshot_iteration(snapshot: Union[str, Path]) -> int:
    """Iteration encoded in an `iter_XXXXXXXX` snapshot dir name (0 when
    the name carries none — e.g. a converted reference checkpoint)."""
    name = Path(snapshot).name
    if name.startswith("iter_") and name[5:].isdigit():
        return int(name[5:])
    return 0


def discover_latest_snapshot(run_root: Union[str, Path]) -> Optional[Path]:
    """Preemption auto-resume discovery (`--resume-ckpt latest`): the
    highest-iteration snapshot across every timestamped run under a
    `logs/<log_dir>/<log_name>` root (the convention both train CLIs use —
    a restarted run gets a FRESH timestamp dir, so the previous attempt's
    snapshots live in a sibling). Also accepts a single run dir or a bare
    checkpoints dir; ties break toward the newest mtime."""
    run_root = Path(run_root)
    candidates = [
        *run_root.glob("*/checkpoints/iter_*"),
        *run_root.glob("checkpoints/iter_*"),
        *run_root.glob("iter_*"),
    ]
    candidates = [c for c in candidates if c.is_dir()]
    if not candidates:
        return None
    return max(
        candidates, key=lambda c: (snapshot_iteration(c), c.stat().st_mtime)
    )


# ---------------------------------------------------------------------------
# torch <-> flax generator conversion
# ---------------------------------------------------------------------------

def _lin_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"weight": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _modconv_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"])  # (1, out, in, kh, kw)
    return {
        "weight": w[0].transpose(2, 3, 1, 0),  # (kh, kw, in, out)
        "modulation": _lin_t2f(f"{prefix}.modulation", sd),
    }


def _styled_conv_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        "conv": _modconv_t2f(f"{prefix}.conv", sd),
        "noise": {"weight": np.asarray(sd[f"{prefix}.noise.weight"]).reshape(1)},
        "bias": np.asarray(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        "conv": _modconv_t2f(f"{prefix}.conv", sd),
        "bias": np.asarray(sd[f"{prefix}.bias"]).reshape(-1),
    }


def torch_generator_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference generator state_dict -> {"params": ..., "noises": ...} for
    models.stylegan2.Generator / models.swagan.Generator (both share key
    structure; SWAGAN's ToRGB simply has 12 output channels)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    # style MLP: torch style.0 is PixelNorm (no params); linears are 1..n
    style_ids = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"style\.(\d+)\.weight", k))
    )
    for i in style_ids:
        params[f"style_{i}"] = _lin_t2f(f"style.{i}", sd)

    params["input"] = sd["input.input"].transpose(0, 2, 3, 1)
    params["conv1"] = _styled_conv_t2f("conv1", sd)
    params["to_rgb1"] = _to_rgb_t2f("to_rgb1", sd)

    n_convs = len({k.split(".")[1] for k in sd if k.startswith("convs.")})
    for i in range(n_convs):
        params[f"convs_{i}"] = _styled_conv_t2f(f"convs.{i}", sd)
    n_rgbs = len({k.split(".")[1] for k in sd if k.startswith("to_rgbs.")})
    for i in range(n_rgbs):
        params[f"to_rgbs_{i}"] = _to_rgb_t2f(f"to_rgbs.{i}", sd)

    noises = {}
    for k, v in sd.items():
        if k.startswith("noises.noise_"):
            name = k.split(".")[1]
            noises[name] = v.transpose(0, 2, 3, 1)  # (1,1,H,W) -> (1,H,W,1)

    out: Dict[str, Any] = {"params": params}
    if noises:
        out["noises"] = noises
    return out


def _lin_f2t(prefix: str, p: Dict[str, np.ndarray], out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(p["weight"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _modconv_f2t(prefix: str, p: Dict[str, Any], out: Dict[str, np.ndarray]):
    w = np.asarray(p["weight"])  # (kh, kw, in, out)
    out[f"{prefix}.weight"] = w.transpose(3, 2, 0, 1)[None]
    _lin_f2t(f"{prefix}.modulation", p["modulation"], out)


def flax_generator_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of torch_generator_to_flax (for exporting checkpoints usable
    by the reference implementation)."""
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for name, p in params.items():
        if name.startswith("style_"):
            _lin_f2t(f"style.{name.rsplit('_', 1)[1]}", p, sd)
        elif name == "input":
            sd["input.input"] = np.asarray(p).transpose(0, 3, 1, 2)
        elif name == "conv1" or name.startswith("convs_"):
            t_name = "conv1" if name == "conv1" else f"convs.{name.rsplit('_', 1)[1]}"
            _modconv_f2t(f"{t_name}.conv", p["conv"], sd)
            sd[f"{t_name}.noise.weight"] = np.asarray(p["noise"]["weight"]).reshape(1)
            sd[f"{t_name}.activate.bias"] = np.asarray(p["bias"])
        elif name == "to_rgb1" or name.startswith("to_rgbs_"):
            t_name = (
                "to_rgb1" if name == "to_rgb1" else f"to_rgbs.{name.rsplit('_', 1)[1]}"
            )
            _modconv_f2t(f"{t_name}.conv", p["conv"], sd)
            c = np.asarray(p["bias"]).reshape(-1)
            sd[f"{t_name}.bias"] = c.reshape(1, -1, 1, 1)
    for name, buf in variables.get("noises", {}).items():
        sd[f"noises.{name}"] = np.asarray(buf).transpose(0, 3, 1, 2)
    return sd


# ---------------------------------------------------------------------------
# torch -> flax discriminator conversion (StyleGAN2)
# ---------------------------------------------------------------------------

def _conv_layer_t2f(prefix: str, sd: Dict[str, np.ndarray],
                    downsample: bool) -> Dict[str, Any]:
    """Torch ConvLayer is a Sequential: [Blur,] EqualConv2d [, FusedLeakyReLU].
    Blur has no params; indices shift with downsample."""
    conv_idx = 1 if downsample else 0
    act_idx = conv_idx + 1
    w = np.asarray(sd[f"{prefix}.{conv_idx}.weight"])  # (out, in, kh, kw)
    out: Dict[str, Any] = {"conv": {"weight": w.transpose(2, 3, 1, 0)}}
    if f"{prefix}.{conv_idx}.bias" in sd:
        out["conv"]["bias"] = np.asarray(sd[f"{prefix}.{conv_idx}.bias"])
    if f"{prefix}.{act_idx}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.{act_idx}.bias"])
    return out


def torch_discriminator_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference StyleGAN2 Discriminator state_dict -> flax params for
    models.stylegan2.Discriminator. Torch layout: convs.0 = input ConvLayer,
    convs.1..n = ResBlocks, final_conv, final_linear.{0,1}
    (reference model.py:634-676)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    params["conv_in"] = _conv_layer_t2f("convs.0", sd, downsample=False)

    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("convs.")}) - 1
    for i in range(n_blocks):
        t = f"convs.{i + 1}"
        params[f"blocks_{i}"] = {
            "conv1": _conv_layer_t2f(f"{t}.conv1", sd, downsample=False),
            "conv2": _conv_layer_t2f(f"{t}.conv2", sd, downsample=True),
            "skip": _conv_layer_t2f(f"{t}.skip", sd, downsample=True),
        }

    params["final_conv"] = _conv_layer_t2f("final_conv", sd, downsample=False)

    # final_linear.0 input is the flattened (C, 4, 4) map; reorder columns
    # from torch NCHW flatten to flax NHWC flatten
    w0 = np.asarray(sd["final_linear.0.weight"])  # (out, C*16)
    out_dim, in_dim = w0.shape
    c = in_dim // 16
    w0 = w0.reshape(out_dim, c, 4, 4).transpose(0, 2, 3, 1).reshape(out_dim, in_dim)
    params["final_linear_0"] = {
        "weight": w0.T,
        "bias": np.asarray(sd["final_linear.0.bias"]),
    }
    params["final_linear_1"] = _lin_t2f("final_linear.1", sd)
    return {"params": params}


def torch_swagan_discriminator_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference SWAGAN Discriminator state_dict -> flax params for
    models.swagan.Discriminator. Torch layout: from_rgbs.{i}.conv (1x1
    ConvLayer), convs.{i}.{conv1,conv2} (ConvBlock, conv2 downsamples),
    final_conv, final_linear.{0,1} (reference swagan/model.py:329-399);
    dwt buffers are fixed Haar kernels and carry no parameters."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    n_rgbs = len({k.split(".")[1] for k in sd if k.startswith("from_rgbs.")})
    for i in range(n_rgbs):
        params[f"from_rgbs_{i}"] = {
            "conv": _conv_layer_t2f(f"from_rgbs.{i}.conv", sd,
                                    downsample=False)
        }
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("convs.")})
    for i in range(n_blocks):
        params[f"convs_{i}"] = {
            "conv1": _conv_layer_t2f(f"convs.{i}.conv1", sd,
                                     downsample=False),
            "conv2": _conv_layer_t2f(f"convs.{i}.conv2", sd,
                                     downsample=True),
        }

    params["final_conv"] = _conv_layer_t2f("final_conv", sd,
                                           downsample=False)
    w0 = np.asarray(sd["final_linear.0.weight"])  # (out, C*16)
    out_dim, in_dim = w0.shape
    c = in_dim // 16
    w0 = w0.reshape(out_dim, c, 4, 4).transpose(0, 2, 3, 1).reshape(
        out_dim, in_dim
    )
    params["final_linear_0"] = {
        "weight": w0.T,
        "bias": np.asarray(sd["final_linear.0.bias"]),
    }
    params["final_linear_1"] = _lin_t2f("final_linear.1", sd)
    return {"params": params}


def convert_autoencoder_checkpoint(checkpoint: Dict) -> Dict:
    """Split a legacy `autoencoder` state dict into `encoder` / `decoder`
    sub-dicts, stripping DDP `module.` prefixes (reference
    networks/convert_autoencoder_checkpoint.py:7-35)."""
    if all(key in checkpoint for key in ("encoder", "decoder")):
        return checkpoint
    encoder_weights: Dict[str, Any] = {}
    decoder_weights: Dict[str, Any] = {}
    autoencoder_weights: Dict[str, Any] = {}
    split_targets = {"encoder": encoder_weights, "decoder": decoder_weights}
    for name, weight in checkpoint["autoencoder"].items():
        parts = name.split(".")
        if parts[0] == "module":
            parts = parts[1:]
        for target_name, target in split_targets.items():
            if target_name in parts:
                idx = parts.index(target_name)
                target[".".join(parts[idx + 1 :])] = weight
                break
        autoencoder_weights[".".join(parts)] = weight
    checkpoint["autoencoder"] = autoencoder_weights
    checkpoint["encoder"] = encoder_weights
    checkpoint["decoder"] = decoder_weights
    return checkpoint


# ---------------------------------------------------------------------------
# torch -> flax DocUFCN conversion
# ---------------------------------------------------------------------------

def _conv_bn_t2f(
    prefix: str,
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    stats: Dict[str, Any],
    transpose: bool = False,
) -> None:
    """One reference conv+BN layer (doc_ufcn.py:44-51 build_conv_layer) ->
    our ConvBNActDrop {conv, bn} params + batch_stats."""
    w = np.asarray(sd[f"{prefix}.conv.weight"])
    if transpose:
        # torch ConvTranspose2d weight (in, out, kh, kw); flax ConvTranspose
        # correlates the non-flipped kernel with the zero-inserted input, so
        # the torch "stamp w at each input pixel" semantics need the spatial
        # axes reversed.
        kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1]
    else:
        kernel = w.transpose(2, 3, 1, 0)  # (out, in, kh, kw) -> (kh, kw, in, out)
    params["conv"] = {
        "kernel": np.ascontiguousarray(kernel),
        "bias": np.asarray(sd[f"{prefix}.conv.bias"]),
    }
    params["bn"] = {
        "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
    }
    stats["bn"] = {
        "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
    }


def torch_doc_ufcn_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DocUFCN state_dict (doc_ufcn.py:11-82; torch Sequential
    naming `encoder_blocks.{b}.{i}.{conv,bn}`, `decoder_blocks.{d}.{conv,
    upsample}.{conv,bn}`, `classifier`) -> {"params", "batch_stats"} for
    models.doc_ufcn.DocUFCN (base / no_dropout variants)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    n_enc = len({k.split(".")[1] for k in sd if k.startswith("encoder_blocks.")})
    for b in range(n_enc):
        block_p: Dict[str, Any] = {}
        block_s: Dict[str, Any] = {}
        n_convs = len(
            {k.split(".")[2] for k in sd if k.startswith(f"encoder_blocks.{b}.")}
        )
        for i in range(n_convs):
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            _conv_bn_t2f(f"encoder_blocks.{b}.{i}", sd, p, s)
            block_p[f"conv_{i}"] = p
            block_s[f"conv_{i}"] = s
        params[f"encoder_{b}"] = block_p
        stats[f"encoder_{b}"] = block_s

    n_dec = len({k.split(".")[1] for k in sd if k.startswith("decoder_blocks.")})
    for d in range(n_dec):
        block_p, block_s = {}, {}
        for sub, transpose in (("conv", False), ("upsample", True)):
            p, s = {}, {}
            _conv_bn_t2f(f"decoder_blocks.{d}.{sub}", sd, p, s, transpose=transpose)
            block_p[sub] = p
            block_s[sub] = s
        params[f"decoder_{d}"] = block_p
        stats[f"decoder_{d}"] = block_s

    params["classifier"] = {
        "kernel": np.asarray(sd["classifier.weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd["classifier.bias"]),
    }
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# torch -> flax StyleGAN1 conversion
# ---------------------------------------------------------------------------

def _equal_lin_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference EqualLinear (equal_lr-wrapped nn.Linear: `.linear.weight_orig`,
    stylegan1/model.py:27-55, :197-208) -> our stylegan1.EqualLinear."""
    return {
        "weight": np.asarray(sd[f"{prefix}.linear.weight_orig"]).T,
        "bias": np.asarray(sd[f"{prefix}.linear.bias"]),
    }


def _equal_conv_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference EqualConv2d (`.conv.weight_orig` (out,in,kh,kw),
    stylegan1/model.py:185-194) -> our stylegan1.EqualConv (kh,kw,in,out)."""
    return {
        "weight": np.asarray(sd[f"{prefix}.conv.weight_orig"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[f"{prefix}.conv.bias"]),
    }


def _adain_t2f(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference AdaptiveInstanceNorm: style bias[:C] is initialized to 1 and
    gamma used directly (model.py:270-287); ours stores bias around 0 and adds
    1 at call time — shift the first half of the bias."""
    lin = _equal_lin_t2f(f"{prefix}.style", sd)
    bias = lin["bias"].copy()
    c = bias.shape[0] // 2
    bias[:c] -= 1.0
    lin["bias"] = bias
    return {"style": lin}


def torch_stylegan1_generator_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference StyledGenerator state_dict (stylegan1/model.py:463-530) ->
    flax variables for models.stylegan1.StyledGenerator."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    # style MLP: torch Sequential [PixelNorm, (EqualLinear, LeakyReLU)*n]
    lin_ids = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"style\.(\d+)\.linear\.weight_orig", k))
    )
    for our_i, torch_i in enumerate(lin_ids):
        params[f"style_{our_i}"] = _equal_lin_t2f(f"style.{torch_i}", sd)

    gen: Dict[str, Any] = {}
    n_blocks = len(
        {k.split(".")[2] for k in sd if k.startswith("generator.progression.")}
    )
    for i in range(n_blocks):
        t = f"generator.progression.{i}"
        block: Dict[str, Any] = {}
        if f"{t}.conv1.input" in sd:  # initial ConstantInput
            block["input"] = sd[f"{t}.conv1.input"].transpose(0, 2, 3, 1)
        elif f"{t}.conv1.0.weight" in sd:  # FusedUpsample (+ Blur)
            w = sd[f"{t}.conv1.0.weight"]  # (in, out, kh, kw)
            block["conv1_fused"] = {
                "weight": w.transpose(2, 3, 0, 1),
                "bias": sd[f"{t}.conv1.0.bias"],
            }
        else:  # Upsample -> EqualConv2d -> Blur
            block["conv1"] = _equal_conv_t2f(f"{t}.conv1.1", sd)
        for j in (1, 2):
            block[f"noise{j}"] = {
                "weight": sd[f"{t}.noise{j}.weight_orig"].transpose(0, 2, 3, 1)
            }
            block[f"adain{j}"] = _adain_t2f(f"{t}.adain{j}", sd)
        block["conv2"] = _equal_conv_t2f(f"{t}.conv2", sd)
        gen[f"progression_{i}"] = block

    n_rgb = len({k.split(".")[2] for k in sd if k.startswith("generator.to_rgb.")})
    for i in range(n_rgb):
        gen[f"to_rgb_{i}"] = _equal_conv_t2f(f"generator.to_rgb.{i}", sd)

    params["generator"] = gen
    return {"params": params}


# ---------------------------------------------------------------------------
# torch -> flax EMANet conversion
# ---------------------------------------------------------------------------

def _set_path(tree: Dict[str, Any], path: str, value: Any) -> None:
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def torch_emanet_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference EMANet state_dict (ema_net/network.py:267-311; extractor is
    a Sequential of [deep-stem Sequential, bn1, relu, maxpool, layer1..4]) ->
    {"params", "batch_stats", "mu"} for models.ema_net.EMANet.

    Works for both plain-BatchNorm2d and the vendored SynchronizedBatchNorm2d
    checkpoints (identical state_dict keys)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(torch_prefix: str, flax_path: str, bias: bool = False) -> None:
        p: Dict[str, Any] = {
            "kernel": sd[f"{torch_prefix}.weight"].transpose(2, 3, 1, 0)
        }
        if bias:
            p["bias"] = sd[f"{torch_prefix}.bias"]
        _set_path(params, flax_path, p)

    def bn(torch_prefix: str, flax_path: str) -> None:
        _set_path(
            params,
            flax_path,
            {
                "scale": sd[f"{torch_prefix}.weight"],
                "bias": sd[f"{torch_prefix}.bias"],
            },
        )
        _set_path(
            stats,
            flax_path,
            {
                "mean": sd[f"{torch_prefix}.running_mean"],
                "var": sd[f"{torch_prefix}.running_var"],
            },
        )

    # deep stem (torch: extractor.0 = Sequential(conv,bn,relu,conv,bn,relu,conv))
    conv("extractor.0.0", "extractor/stem_conv1")
    bn("extractor.0.1", "extractor/stem_bn1")
    conv("extractor.0.3", "extractor/stem_conv2")
    bn("extractor.0.4", "extractor/stem_bn2")
    conv("extractor.0.6", "extractor/stem_conv3")
    bn("extractor.1", "extractor/bn1")

    for li, torch_idx in enumerate((4, 5, 6, 7), start=1):
        n_blocks = len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith(f"extractor.{torch_idx}.")
            }
        )
        for i in range(n_blocks):
            t = f"extractor.{torch_idx}.{i}"
            f = f"extractor/layer{li}/block_{i}"
            for j in (1, 2, 3):
                conv(f"{t}.conv{j}", f"{f}/conv{j}")
                bn(f"{t}.bn{j}", f"{f}/bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0", f"{f}/downsample_conv")
                bn(f"{t}.downsample.1", f"{f}/downsample_bn")

    conv("fc0.conv", "fc0_conv")
    bn("fc0.bn", "fc0_bn")
    conv("emau.conv1", "emau/conv1", bias=True)
    conv("emau.conv2.0", "emau/conv2_conv")
    bn("emau.conv2.1", "emau/conv2_bn")
    conv("fc1.0.conv", "fc1_conv")
    bn("fc1.0.bn", "fc1_bn")
    conv("fc2", "fc2", bias=True)

    return {"params": params, "batch_stats": stats, "mu": sd["emau.mu"]}


# ---------------------------------------------------------------------------
# torch -> flax TransUNet conversion
# ---------------------------------------------------------------------------

def torch_transunet_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference TransUNet VisionTransformer state_dict
    (trans_u_net/vit_seg_modeling.py:376-455 + vit_seg_modeling_resnet_skip.py)
    -> {"params", "batch_stats"} for models.trans_u_net.VisionTransformer."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(t: str, f: str, bias: bool = False) -> None:
        p: Dict[str, Any] = {"kernel": sd[f"{t}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            p["bias"] = sd[f"{t}.bias"]
        _set_path(params, f, p)

    def affine(t: str, f: str) -> None:  # GroupNorm / LayerNorm
        _set_path(
            params, f, {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}
        )

    def lin(t: str, f: str) -> None:
        _set_path(
            params,
            f,
            {"kernel": sd[f"{t}.weight"].T, "bias": sd[f"{t}.bias"]},
        )

    def conv_bn_relu(t: str, f: str) -> None:  # torch Sequential(conv, bn, relu)
        conv(f"{t}.0", f"{f}/conv")
        _set_path(
            params,
            f"{f}/bn",
            {"scale": sd[f"{t}.1.weight"], "bias": sd[f"{t}.1.bias"]},
        )
        _set_path(
            stats,
            f"{f}/bn",
            {
                "mean": sd[f"{t}.1.running_mean"],
                "var": sd[f"{t}.1.running_var"],
            },
        )

    emb = "transformer.embeddings"
    if f"{emb}.hybrid_model.root.conv.weight" in sd:
        conv(f"{emb}.hybrid_model.root.conv", "hybrid_model/root_conv")
        affine(f"{emb}.hybrid_model.root.gn", "hybrid_model/root_gn")
        units = sorted(
            {
                tuple(k.split(".")[4:6])
                for k in sd
                if k.startswith(f"{emb}.hybrid_model.body.")
            }
        )
        for block, unit in units:
            t = f"{emb}.hybrid_model.body.{block}.{unit}"
            f = f"hybrid_model/{block}_{unit}"
            for j in (1, 2, 3):
                conv(f"{t}.conv{j}", f"{f}/conv{j}")
                affine(f"{t}.gn{j}", f"{f}/gn{j}")
            if f"{t}.downsample.weight" in sd:
                conv(f"{t}.downsample", f"{f}/downsample")
                affine(f"{t}.gn_proj", f"{f}/gn_proj")

    conv(f"{emb}.patch_embeddings", "patch_embeddings", bias=True)
    params["position_embeddings"] = sd[f"{emb}.position_embeddings"]

    n_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("transformer.encoder.layer.")}
    )
    for i in range(n_layers):
        t = f"transformer.encoder.layer.{i}"
        f = f"encoderblock_{i}"
        affine(f"{t}.attention_norm", f"{f}/attention_norm")
        affine(f"{t}.ffn_norm", f"{f}/ffn_norm")
        for name in ("query", "key", "value", "out"):
            lin(f"{t}.attn.{name}", f"{f}/attn/{name}")
        lin(f"{t}.ffn.fc1", f"{f}/ffn/fc1")
        lin(f"{t}.ffn.fc2", f"{f}/ffn/fc2")
    affine("transformer.encoder.encoder_norm", "encoder_norm")

    conv_bn_relu("decoder.conv_more", "conv_more")
    n_blocks = len(
        {k.split(".")[2] for k in sd if k.startswith("decoder.blocks.")}
    )
    for i in range(n_blocks):
        conv_bn_relu(f"decoder.blocks.{i}.conv1", f"decoder_block_{i}/conv1")
        conv_bn_relu(f"decoder.blocks.{i}.conv2", f"decoder_block_{i}/conv2")

    conv("segmentation_head.0", "segmentation_head", bias=True)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# reference .pt loading
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: Union[str, Path]) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a reference torch checkpoint (dict keyed by network name,
    reference Snapshotter format) into numpy state dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for name, sub in ckpt.items():
        if hasattr(sub, "items"):
            out[name] = {
                k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sub.items()
            }
    return out


def gan_snapshot_tree_from_torch(
    torch_ckpt: Dict[str, Dict[str, np.ndarray]],
    stylegan_variant: Union[int, str] = 2,
) -> Dict[str, Any]:
    """Reference GAN .pt checkpoint (keys generator/discriminator/g_ema,
    reference train_stylegan_2.py:75-77 + Snapshotter layout) -> our
    snapshot-tree layout for restore_gan_snapshot. Only the keys present in
    the torch checkpoint appear in the result (reference load_weights
    key-selects, networks/__init__.py:22-29)."""
    tree: Dict[str, Any] = {}
    for src, dst in (("generator", "generator"), ("g_ema", "g_ema")):
        if src in torch_ckpt:
            g = torch_generator_to_flax(torch_ckpt[src])
            tree[dst] = g["params"]
            if "noises" in g and "g_noises" not in tree:
                tree["g_noises"] = g["noises"]
    if "discriminator" in torch_ckpt:
        if str(stylegan_variant) == "swagan":
            d = torch_swagan_discriminator_to_flax(torch_ckpt["discriminator"])
        else:
            d = torch_discriminator_to_flax(torch_ckpt["discriminator"])
        tree["discriminator"] = d["params"]
    if not tree:
        # a checkpoint with NO recognized network key would otherwise
        # "restore" nothing silently (restore_gan_snapshot is key-optional
        # by design) and a fine-tune would start from random init
        raise KeyError(
            "torch checkpoint has none of the expected keys "
            "generator/discriminator/g_ema; found: "
            f"{sorted(torch_ckpt)}"
        )
    return tree


def merge_matching_leaves(fresh: Any, loaded: Any, _copied=None) -> tuple:
    """Shape-tolerant warm start: copy every leaf of `loaded` whose path
    exists in `fresh` with the same shape; keep `fresh`'s init elsewhere.
    Returns (merged_tree, copied_count, skipped_count)."""
    import jax
    import jax.numpy as jnp

    counts = _copied if _copied is not None else [0]

    def merge(f, l):
        if isinstance(f, dict) and isinstance(l, dict):
            return {
                k: merge(f[k], l[k]) if k in l else f[k] for k in f
            }
        f_shape = getattr(f, "shape", None)
        l_arr = jnp.asarray(l)
        if f_shape is not None and tuple(f_shape) == tuple(l_arr.shape):
            counts[0] += 1
            return l_arr
        return f

    merged = merge(fresh, loaded)
    total = len(jax.tree_util.tree_leaves(fresh))
    return merged, counts[0], total - counts[0]


def upscale_gan_snapshot_tree(
    tree: Dict[str, Any], source_size: int, target_size: int
) -> Dict[str, Any]:
    """Re-key a smaller-resolution StyleGAN2 snapshot so its parameters land
    on the matching stages of a larger-resolution model (the 256px
    warm-start path — VERDICT r4 #2: init the 256px run from the converged
    128px checkpoint instead of cold-starting into mode collapse).

    Generator/g_ema/g_noises params index from the 4px end (models/
    stylegan2.py setup), so they already align by name — convs_0..9 of a
    128px G are the first 10 convs of a 256px G. Discriminator blocks index
    from the INPUT resolution down (models/stylegan2.py Discriminator), so
    source blocks_i becomes target blocks_{i+shift}; conv_in and the new
    top blocks keep fresh init. Apply with merge_matching_leaves so any
    remaining shape mismatch falls back to fresh init instead of crashing."""
    import math as _math

    shift = int(_math.log2(target_size)) - int(_math.log2(source_size))
    assert shift >= 0, (source_size, target_size)
    out: Dict[str, Any] = {}
    for key, sub in tree.items():
        if key == "discriminator" and shift > 0:
            renamed = {}
            for name, value in sub.items():
                if name.startswith("blocks_"):
                    renamed[f"blocks_{int(name.split('_')[1]) + shift}"] = value
                elif name == "conv_in":
                    continue  # channel count differs at the new resolution
                else:
                    renamed[name] = value
            out[key] = renamed
        else:
            out[key] = sub
    return out


def load_generator_variables(
    checkpoint_path: Union[str, Path], key: str = "g_ema"
) -> Dict[str, Any]:
    """Load generator variables from either an orbax snapshot dir (ours) or a
    reference torch .pt (reference load_autoencoder_or_generator,
    networks/__init__.py:415-423)."""
    checkpoint_path = Path(checkpoint_path)
    if checkpoint_path.is_dir():
        tree = load_pytree(checkpoint_path)
        sub = tree[key] if key in tree else tree
        # our GAN snapshots store g_ema as bare params; attach noises if present
        if "params" in sub:
            return sub
        variables = {"params": sub}
        if "g_noises" in tree:
            variables["noises"] = tree["g_noises"]
        return variables
    torch_ckpt = load_torch_checkpoint(checkpoint_path)
    return torch_generator_to_flax(torch_ckpt[key])


def save_pytree_npz(path: Union[str, Path], tree: Dict[str, Any]) -> None:
    """Flatten a nested dict pytree to '/'-joined keys and save as npz
    (framework-neutral weight interchange, e.g. converted metric backbones
    — scripts/fetch_metric_weights.py)."""
    flat = {}

    def _walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    _walk("", tree)
    np.savez(str(path), **flat)


def unflatten_npz(data) -> Dict[str, Any]:
    """Inverse of save_pytree_npz: an npz (or dict) with '/'-joined keys
    back to a nested dict."""
    tree: Dict[str, Any] = {}
    for key in getattr(data, "files", None) or list(data):
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree

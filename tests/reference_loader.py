"""Import pure-torch modules from the reference repo for A/B parity tests.

The reference's `networks/__init__.py` JIT-builds CUDA extensions at import
(op/upfirdn2d.py:9-15), so we register a stub `networks` package with only a
`__path__` and import leaf modules directly — they execute standalone.
Tests using this must skip when REFERENCE does not exist.
"""

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference/stylegan_code_finder")


def randomize_bn(torch, module, seed: int = 1):
    """Randomize BN affine params + running stats so eval-mode normalization
    is actually exercised by parity tests (fresh init is the identity
    transform). Duck-typed so it also covers the reference's vendored
    SynchronizedBatchNorm2d."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if hasattr(m, "running_mean") and getattr(m, "weight", None) is not None:
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=gen))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=gen))
                m.running_mean.copy_(0.3 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def load_reference_module(dotted: str):
    """Import e.g. 'networks.doc_ufcn.doc_ufcn' from the reference repo
    without executing the heavy package __init__ files above it."""
    if str(REFERENCE) not in sys.path:
        # append, not prepend: the reference root is full of generic top-level
        # names (utils, data, losses, ...) that must not shadow anything
        sys.path.append(str(REFERENCE))
    parts = dotted.split(".")
    for depth in range(1, len(parts)):
        name = ".".join(parts[:depth])
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [str(REFERENCE.joinpath(*parts[:depth]))]
            sys.modules[name] = pkg
    import importlib

    return importlib.import_module(dotted)


def _build_op_stub(torch, name: str):
    """Pure-torch stand-in for the reference's CUDA op package
    (networks/{stylegan2,swagan}/op). Implements the documented semantics of
    upfirdn2d (op/upfirdn2d.py:144-187: zero-insert upsample -> pad/crop ->
    2D FIR convolution -> stride-slice downsample, per channel) and
    fused_leaky_relu (op/fused_act.py:73-87: channel bias + LeakyReLU *
    scale) with plain differentiable torch ops, so the reference models
    import on CPU for A/B parity tests."""
    import contextlib

    F = torch.nn.functional
    mod = types.ModuleType(name)

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        b, c, h, w = input.shape
        kh, kw = kernel.shape
        x = input.reshape(b * c, 1, h, 1, w, 1)
        # zero-insertion upsample
        x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
        x = x.reshape(b * c, 1, h * up, w * up)
        # padding (negative pad = crop)
        p0, p1 = int(pad[0]), int(pad[1])
        x = F.pad(x, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
        x = x[
            :,
            :,
            max(-p0, 0) : x.shape[2] - max(-p1, 0),
            max(-p0, 0) : x.shape[3] - max(-p1, 0),
        ]
        # true 2D convolution with the FIR kernel (conv2d is correlation,
        # so flip), then downsample by stride-slicing
        w2 = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw).to(x.dtype)
        x = F.conv2d(x, w2)
        x = x[:, :, ::down, ::down]
        return x.reshape(b, c, x.shape[2], x.shape[3])

    def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2**0.5):
        shape = [1, -1] + [1] * (input.ndim - 2)
        return F.leaky_relu(
            input + bias.reshape(shape), negative_slope
        ) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(
                input, self.bias, self.negative_slope, self.scale
            )

    gradfix = types.ModuleType(name + ".conv2d_gradfix")
    gradfix.conv2d = F.conv2d
    gradfix.conv_transpose2d = F.conv_transpose2d
    gradfix.no_weight_gradients = contextlib.nullcontext

    mod.upfirdn2d = upfirdn2d
    mod.fused_leaky_relu = fused_leaky_relu
    mod.FusedLeakyReLU = FusedLeakyReLU
    mod.conv2d_gradfix = gradfix
    return mod


def load_reference_stylegan(variant: str):
    """Import reference networks.{stylegan2,swagan}.model with the CUDA op
    packages replaced by pure-torch stubs (the real ones JIT-compile CUDA at
    import, op/upfirdn2d.py:9-15, so they can never load here)."""
    import torch

    for pkg in ("stylegan2", "swagan"):
        opname = f"networks.{pkg}.op"
        if opname not in sys.modules:
            # parent packages must exist before the op module is registered
            for depth, part in enumerate(["networks", pkg]):
                pname = ".".join(["networks", pkg][: depth + 1])
                if pname not in sys.modules:
                    stub = types.ModuleType(pname)
                    stub.__path__ = [
                        str(REFERENCE.joinpath(*pname.split(".")))
                    ]
                    sys.modules[pname] = stub
            sys.modules[opname] = _build_op_stub(torch, opname)
    return load_reference_module(f"networks.{variant}.model")

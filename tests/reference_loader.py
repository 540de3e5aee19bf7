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

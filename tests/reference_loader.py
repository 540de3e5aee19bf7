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


def load_reference_module(dotted: str):
    """Import e.g. 'networks.doc_ufcn.doc_ufcn' from the reference repo
    without executing the heavy package __init__ files above it."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    parts = dotted.split(".")
    for depth in range(1, len(parts)):
        name = ".".join(parts[:depth])
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [str(REFERENCE.joinpath(*parts[:depth]))]
            sys.modules[name] = pkg
    import importlib

    return importlib.import_module(dotted)

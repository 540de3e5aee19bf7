"""Chip-precision pin: EMANet + DocUFCN A/B vs the torch reference at
DEFAULT and HIGHEST conv/matmul precision on the real TPU.

Round-1 chip A/Bs attributed EMANet's ~1.5e-2 delta to TPU default f32
conv precision (bf16 passes through the MXU). That attribution was
unverified (VERDICT r1 weak #6): a wrong-layout bug could hide under
"default precision noise" and look identical. Running the SAME
weights/inputs at `jax.default_matmul_precision("highest")` (full f32
accumulation, 6 MXU passes) separates the two hypotheses — a precision
artifact collapses by orders of magnitude at HIGHEST, a layout bug does
not move.

Reference models: doc_ufcn/doc_ufcn.py:11-104, ema_net/network.py (pure
torch, run on host CPU). Usage (on the TPU, default axon platform):

  python -m synthesis_in_style_tpu.scripts.chip_precision_ab [--models doc_ufcn,emanet]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]


def _reference_loader():
    sys.path.insert(0, str(REPO / "tests"))
    import reference_loader

    return reference_loader


def _deltas(ours: np.ndarray, theirs: np.ndarray) -> str:
    abs_d = np.max(np.abs(ours - theirs))
    scale = np.max(np.abs(theirs))
    return f"max|Δ|={abs_d:.3e}  scale={scale:.3e}  rel={abs_d / scale:.3e}"


def run_doc_ufcn(jax, torch, rl) -> None:
    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
    from synthesis_in_style_tpu.utils.checkpoint import torch_doc_ufcn_to_flax

    TorchDocUFCN = rl.load_reference_module("networks.doc_ufcn.doc_ufcn").DocUFCN
    torch.manual_seed(0)
    ref = TorchDocUFCN(num_classes=4)
    rl.randomize_bn(torch, ref)
    ref.eval()
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    variables = torch_doc_ufcn_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    model = DocUFCN(num_classes=4)

    def fwd():
        return np.asarray(
            jax.jit(
                lambda v, x: model.apply(
                    {"params": v["params"], "batch_stats": v["batch_stats"]},
                    x,
                    train=False,
                )
            )(variables, jnp.asarray(x))
        )

    print(f"doc_ufcn  default  {_deltas(fwd(), theirs)}", flush=True)
    with jax.default_matmul_precision("highest"):
        print(f"doc_ufcn  highest  {_deltas(fwd(), theirs)}", flush=True)


def run_emanet(jax, torch, rl) -> None:
    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.ema_net import EMANet
    from synthesis_in_style_tpu.utils.checkpoint import torch_emanet_to_flax

    ref_mod = rl.load_reference_module("networks.ema_net.network")
    torch.manual_seed(0)
    ref = ref_mod.EMANet(
        num_classes=3, n_layers=50, stride=8, use_pretrained_resnet=False
    )
    rl.randomize_bn(torch, ref)
    ref.eval()
    x = np.random.default_rng(2).normal(size=(1, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    converted = torch_emanet_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    model = EMANet(num_classes=3, n_layers=50, stride=8)

    def fwd():
        return np.asarray(
            jax.jit(
                lambda v, mu, x: model.apply(
                    {"params": v["params"], "batch_stats": v["batch_stats"]},
                    x,
                    mu,
                    train=False,
                )
            )(converted, jnp.asarray(converted["mu"]), jnp.asarray(x))
        )

    print(f"emanet    default  {_deltas(fwd(), theirs)}", flush=True)
    with jax.default_matmul_precision("highest"):
        print(f"emanet    highest  {_deltas(fwd(), theirs)}", flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--models", default="doc_ufcn,emanet")
    args = parser.parse_args()

    import jax
    import torch

    rl = _reference_loader()
    print(f"devices: {jax.devices()}", flush=True)
    for name in args.models.split(","):
        {"doc_ufcn": run_doc_ufcn, "emanet": run_emanet}[name](jax, torch, rl)


if __name__ == "__main__":
    main()

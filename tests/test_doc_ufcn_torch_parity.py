"""Full-model A/B parity: our flax DocUFCN vs the reference's pure-torch
DocUFCN (doc_ufcn/doc_ufcn.py:11-104), same weights, same input.

The reference model is pure torch (no CUDA extension), so it runs on CPU
here; `torch_doc_ufcn_to_flax` converts its state_dict and the forward
outputs must agree to float tolerance. This is the strongest quality-parity
evidence available without GPU hardware: it proves weight-level and
numeric-level drop-in compatibility for the production segmentation model.
"""

import jax
import numpy as np
import pytest

from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
from synthesis_in_style_tpu.utils.checkpoint import torch_doc_ufcn_to_flax

from reference_loader import REFERENCE, load_reference_module, randomize_bn

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')




@pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")
def test_doc_ufcn_forward_matches_torch_reference():
    torch = pytest.importorskip("torch")
    TorchDocUFCN = load_reference_module("networks.doc_ufcn.doc_ufcn").DocUFCN

    torch.manual_seed(0)
    num_classes = 4
    ref = TorchDocUFCN(num_classes=num_classes)
    randomize_bn(torch, ref)
    ref.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = (
            ref(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(
        np.asarray, torch_doc_ufcn_to_flax(sd)
    )
    ours_model = DocUFCN(num_classes=num_classes)
    ours = np.asarray(
        ours_model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
    )

    assert ours.shape == theirs.shape == (2, 48, 48, num_classes)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

"""Full-model A/B parity tests vs the reference's pure-torch models (CPU).

Each test instantiates the reference implementation, converts its
state_dict with our torch->flax converters, and asserts forward-output
parity. Complements test_doc_ufcn_torch_parity.py.
"""

import numpy as np
import pytest

from reference_loader import REFERENCE, load_reference_module

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not mounted"
)


def _randomize_bn(torch, module, seed: int = 1):
    """Randomize BN affine params + running stats so eval-mode normalization
    is actually exercised (fresh init is the identity transform)."""
    gen = torch.Generator().manual_seed(seed)
    bn_types = tuple(
        t for t in (getattr(torch.nn, "BatchNorm1d", None),
                    getattr(torch.nn, "BatchNorm2d", None))
        if t is not None
    )
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, bn_types):
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=gen))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=gen))
                m.running_mean.copy_(0.3 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_stylegan1_generator_matches_torch_reference():
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_module("networks.stylegan1.model")

    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.stylegan1 import StyledGenerator
    from synthesis_in_style_tpu.utils.checkpoint import (
        torch_stylegan1_generator_to_flax,
    )

    size = 128  # step 5: exercises both plain and FusedUpsample blocks
    torch.manual_seed(0)
    ref = ref_mod.StyledGenerator(size, code_dim=64, n_mlp=2)
    ref.eval()

    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 64)).astype(np.float32)
    noises_nchw = [
        rng.normal(size=(2, 1, 4 * 2**i, 4 * 2**i)).astype(np.float32)
        for i in range(6)
    ]
    with torch.no_grad():
        theirs_img, theirs_acts = ref(
            [torch.from_numpy(z)],
            noise=[torch.from_numpy(n) for n in noises_nchw],
            alpha=1,
            return_intermediate_activations=True,
        )
    theirs_img = theirs_img.permute(0, 2, 3, 1).numpy()

    variables = torch_stylegan1_generator_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours_model = StyledGenerator(size=size, code_dim=64, n_mlp=2)
    ours_img, ours_acts = ours_model.apply(
        {"params": variables["params"]},
        [jnp.asarray(z)],
        noise=[jnp.asarray(n.transpose(0, 2, 3, 1)) for n in noises_nchw],
        alpha=1.0,
        return_intermediate_activations=True,
    )

    assert np.asarray(ours_img).shape == theirs_img.shape == (2, size, size, 3)
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(ours_acts[i]),
            theirs_acts[i].permute(0, 2, 3, 1).numpy(),
            rtol=1e-3,
            atol=2e-4,
            err_msg=f"block {i}",
        )
    np.testing.assert_allclose(
        np.asarray(ours_img), theirs_img, rtol=1e-3, atol=2e-4
    )


@pytest.mark.parametrize("num_classes,dim", [(4, 24), (40, 24)])
def test_pixel_classifier_matches_torch_reference(num_classes, dim):
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_module("networks.pixel_classifier.model")

    from synthesis_in_style_tpu.models.pixel_classifier import PixelClassifier
    from synthesis_in_style_tpu.segmentation.dataset_gan_segmenter import (
        _torch_pixel_classifier_to_flax,
    )

    torch.manual_seed(0)
    ref = ref_mod.PixelClassifier(numpy_class=num_classes, dim=dim)
    ref.init_weights()
    _randomize_bn(torch, ref)
    ref.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, dim)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()

    variables = _torch_pixel_classifier_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours = np.asarray(
        PixelClassifier(num_classes=num_classes).apply(
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
            x,
            train=False,
        )
    )
    assert ours.shape == theirs.shape == (5, num_classes)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

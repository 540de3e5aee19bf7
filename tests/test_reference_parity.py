"""Full-model A/B parity tests vs the reference's pure-torch models (CPU).

Each test instantiates the reference implementation, converts its
state_dict with our torch->flax converters, and asserts forward-output
parity. Complements test_doc_ufcn_torch_parity.py.
"""

import numpy as np
import pytest

from reference_loader import (
    REFERENCE,
    load_reference_module,
    load_reference_stylegan,
    randomize_bn as _randomize_bn,
)

pytestmark = [
    pytest.mark.skipif(
        not REFERENCE.exists(), reason="reference repo not mounted"
    ),
    pytest.mark.slow,  # excluded from the quick lane (-m 'not slow')
]


@pytest.mark.parametrize("variant", ["stylegan2", "swagan"])
def test_stylegan2_generator_matches_torch_reference(variant):
    """Full-model A/B: reference Generator (stylegan2/model.py:367-561,
    swagan/model.py:94-283, imported with pure-torch op stubs) vs ours with
    torch_generator_to_flax-converted weights — fixed noise buffers,
    intermediate activations, and the truncation + style-mixing path."""
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_stylegan(variant)

    import jax.numpy as jnp

    if variant == "stylegan2":
        from synthesis_in_style_tpu.models.stylegan2 import Generator
    else:
        from synthesis_in_style_tpu.models.swagan import Generator
    from synthesis_in_style_tpu.utils.checkpoint import torch_generator_to_flax

    torch.manual_seed(0)
    ref = ref_mod.Generator(64, 64, 2)
    ref.eval()
    z1 = torch.randn(2, 64)
    z2 = torch.randn(2, 64)

    variables = torch_generator_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours_model = Generator(size=64, style_dim=64, n_mlp=2)
    ours_vars = {"params": variables["params"], "noises": variables["noises"]}

    # 1) stored-noise-buffer path + per-layer intermediate activations
    with torch.no_grad():
        theirs_img, theirs_acts = ref(
            [z1], randomize_noise=False, return_intermediate_activations=True
        )
    ours_img, ours_acts = ours_model.apply(
        ours_vars,
        [jnp.asarray(z1.numpy())],
        randomize_noise=False,
        return_intermediate_activations=True,
    )
    assert set(ours_acts) == set(theirs_acts)
    for k in theirs_acts:
        np.testing.assert_allclose(
            np.asarray(ours_acts[k]),
            theirs_acts[k].permute(0, 2, 3, 1).numpy(),
            rtol=1e-3,
            atol=5e-5,
            err_msg=f"activation {k}",
        )
    np.testing.assert_allclose(
        np.asarray(ours_img),
        theirs_img.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=5e-5,
    )

    # 2) truncation + style mixing + explicit noise
    with torch.no_grad():
        trunc = ref.mean_latent(64)
        noises = [
            torch.randn(1, 1, *shape[1:3])
            for shape in ours_model.noise_shapes()
        ]
        theirs_img, _ = ref(
            [z1, z2],
            inject_index=3,
            truncation=0.7,
            truncation_latent=trunc,
            noise=noises,
        )
    ours_img, _ = ours_model.apply(
        ours_vars,
        [jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy())],
        inject_index=3,
        truncation=0.7,
        truncation_latent=jnp.asarray(trunc.numpy()),
        noise=[jnp.asarray(n.numpy().transpose(0, 2, 3, 1)) for n in noises],
    )
    np.testing.assert_allclose(
        np.asarray(ours_img),
        theirs_img.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=5e-5,
    )


@pytest.mark.parametrize("variant", ["stylegan2", "swagan"])
def test_stylegan2_discriminator_matches_torch_reference(variant):
    """A/B: reference Discriminator (stylegan2/model.py:634-692,
    swagan/model.py:325-399) logits vs ours through the torch->flax
    converters. Batch of 4 = one full minibatch-stddev group."""
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_stylegan(variant)

    import jax.numpy as jnp

    if variant == "stylegan2":
        from synthesis_in_style_tpu.models.stylegan2 import Discriminator
        from synthesis_in_style_tpu.utils.checkpoint import (
            torch_discriminator_to_flax as convert,
        )
    else:
        from synthesis_in_style_tpu.models.swagan import Discriminator
        from synthesis_in_style_tpu.utils.checkpoint import (
            torch_swagan_discriminator_to_flax as convert,
        )

    torch.manual_seed(1)
    ref = ref_mod.Discriminator(64)
    ref.eval()
    x = torch.randn(4, 3, 64, 64)
    with torch.no_grad():
        theirs = ref(x).numpy()

    variables = convert({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = np.asarray(
        Discriminator(size=64).apply(
            variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        )
    )
    assert ours.shape == theirs.shape == (4, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_emanet_matches_torch_reference():
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_module("networks.ema_net.network")

    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.ema_net import EMANet
    from synthesis_in_style_tpu.utils.checkpoint import torch_emanet_to_flax

    torch.manual_seed(0)
    ref = ref_mod.EMANet(
        num_classes=3, n_layers=50, stride=8, use_pretrained_resnet=False
    )
    _randomize_bn(torch, ref)
    ref.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = (
            ref(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    converted = torch_emanet_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours_model = EMANet(num_classes=3, n_layers=50, stride=8)
    ours = np.asarray(
        ours_model.apply(
            {
                "params": converted["params"],
                "batch_stats": converted["batch_stats"],
            },
            jnp.asarray(x),
            jnp.asarray(converted["mu"]),
            train=False,
        )
    )
    assert ours.shape == theirs.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_transunet_matches_torch_reference():
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_module("networks.trans_u_net.vit_seg_modeling")

    import copy

    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.trans_u_net import (
        VIT_CONFIGS,
        VisionTransformer,
    )
    from synthesis_in_style_tpu.utils.checkpoint import torch_transunet_to_flax

    img_size, n_classes = 64, 3
    ref_cfg = copy.deepcopy(ref_mod.VIT_CONFIGS["R50-ViT-B_16"])
    ref_cfg.n_classes = n_classes
    ref_cfg.n_skip = 3
    ref_cfg.patches.grid = (img_size // 16, img_size // 16)

    torch.manual_seed(0)
    ref = ref_mod.VisionTransformer(ref_cfg, img_size=img_size,
                                    num_classes=n_classes)
    _randomize_bn(torch, ref)
    ref.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = (
            ref(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    converted = torch_transunet_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    our_cfg = VIT_CONFIGS["R50-ViT-B_16"]()
    our_cfg["n_classes"] = n_classes
    our_cfg["n_skip"] = 3
    our_cfg["patches"]["grid"] = (img_size // 16, img_size // 16)
    ours_model = VisionTransformer(
        config=our_cfg, img_size=img_size, num_classes=n_classes
    )
    ours = np.asarray(
        ours_model.apply(
            {
                "params": converted["params"],
                "batch_stats": converted["batch_stats"],
            },
            jnp.asarray(x),
            train=False,
        )
    )
    assert ours.shape == theirs.shape == (1, img_size, img_size, n_classes)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


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

"""Numerical A/B of the metric backbones against the reference's own code.

VERDICT r1 weak #3 / next-step #7: torchvision is absent, so full pretrained
A/Bs are impossible — but the reference's vendored LPIPS lin path
(losses/lpips/networks_basic.py PNetLin) IS importable with stub modules, and
its torchvision backbone constructor (pretrained_networks.alexnet/vgg16) only
needs a `.features` Sequential in the torchvision layout — which we build in
pure torch here with random weights. That turns the previously
structure-only converter tests into end-to-end numerical ones:

* reference PNetLin (real slicing code, real shipped v0.1 lin weights, stub
  random backbone) vs our LPIPS through `load_torch_alexnet_features` /
  `load_torch_vgg16_features` — same weights, same inputs, |Δ| ≤ 1e-4.
* torch replicas of the InceptionV3 blocks (torchvision BasicConv2d /
  InceptionA / InceptionC / InceptionE semantics, random weights +
  randomized BN stats) vs our flax blocks through `load_torch_inception_v3`
  — exercising count_include_pad=False avg pools, asymmetric 1x7/7x1 convs,
  the E-block max-pool variant, BN folding, and concat order numerically.
* `preprocess` grid-size handling vs torch F.interpolate(bilinear,
  align_corners=False) — pytorch_fid's resize semantics.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from torch import nn

from tests.reference_loader import REFERENCE, load_reference_module, randomize_bn

from synthesis_in_style_tpu.losses.feature_extractors import (
    load_torch_alexnet_features,
    load_torch_vgg16_features,
)
from synthesis_in_style_tpu.losses.lpips import LPIPS

pytestmark = [
    pytest.mark.skipif(
        not REFERENCE.exists(), reason="reference repo not present"
    ),
    pytest.mark.slow,  # excluded from the quick lane (-m 'not slow')
]

LIN_WEIGHTS = REFERENCE / "losses" / "lpips" / "weights" / "v0.1"


# torchvision-layout trunks shared with the semantics-level A/B file
from tests.test_metric_backbones import (
    _torch_alexnet_features as make_torch_alexnet_features,
    _torch_vgg16_features as make_torch_vgg16_features,
)


# ---------------------------------------------------------------------------
# import the reference's PNetLin with stub heavy deps
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_networks_basic():
    """Import losses.lpips.networks_basic from the reference with stubs for
    torchvision / IPython / skimage and the package __init__ (which needs
    skimage + tqdm). The stub `losses.lpips` carries the one function
    networks_basic uses from it, normalize_tensor (__init__.py:43-45)."""
    created = []

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        created.append(name)
        return mod

    features_factories = {
        "alexnet": make_torch_alexnet_features,
        "vgg16": make_torch_vgg16_features,
    }

    def make_tv_model(kind):
        def factory(pretrained=False, **kwargs):
            m = nn.Module()
            m.features = features_factories[kind]()
            return m

        return factory

    tv_models = stub(
        "torchvision.models",
        alexnet=make_tv_model("alexnet"),
        vgg16=make_tv_model("vgg16"),
    )
    stub("torchvision", models=tv_models)
    stub("IPython", embed=lambda *a, **k: None)
    stub("skimage", color=types.ModuleType("skimage.color"))

    # parent package stubs (so the heavy real __init__ never runs), with
    # the reference's normalize_tensor semantics attached for `util.`
    def normalize_tensor(in_feat, eps=1e-10):
        norm_factor = torch.sqrt(
            torch.sum(in_feat ** 2, dim=1, keepdim=True)
        )
        return in_feat / (norm_factor + eps)

    nb = load_reference_module("losses.lpips.networks_basic")
    sys.modules["losses.lpips"].normalize_tensor = normalize_tensor
    yield nb
    for name in created:
        sys.modules.pop(name, None)


def _lpips_ab(net: str, reference_networks_basic, tol: float):
    torch.manual_seed(0)
    pnet = reference_networks_basic.PNetLin(
        pnet_type=net, pnet_rand=True, use_dropout=True, version="0.1"
    )
    sd = torch.load(LIN_WEIGHTS / f"{'alex' if net == 'alex' else 'vgg'}.pth",
                    map_location="cpu")
    missing_lin = [k for k in sd if k not in dict(pnet.named_parameters())]
    assert not missing_lin, missing_lin
    pnet.load_state_dict(sd, strict=False)
    pnet.eval()

    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype("f4")
    b = np.clip(a + 0.3 * rng.randn(*a.shape).astype("f4"), -1, 1)
    with torch.no_grad():
        ref = pnet.forward(torch.from_numpy(a), torch.from_numpy(b))
    ref = np.asarray(ref).reshape(-1)

    features_sd = {
        k: np.asarray(v) for k, v in pnet.net.state_dict().items()
    }
    # reference slices rename features.<i> -> slice<j>.<i>; undo that
    flat_sd = {}
    for key, val in features_sd.items():
        idx = key.split(".", 2)[1]
        flat_sd[f"{idx}.{key.rsplit('.', 1)[1]}"] = val
    loader = (
        load_torch_alexnet_features if net == "alex"
        else load_torch_vgg16_features
    )
    ours = LPIPS(
        net=net,
        backbone_variables=loader(flat_sd),
        lin_weights_path=LIN_WEIGHTS / f"{'alex' if net == 'alex' else 'vgg'}.pth",
    )
    got = np.asarray(
        ours(jnp.asarray(a.transpose(0, 2, 3, 1)),
             jnp.asarray(b.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=tol)


def test_lpips_alex_matches_reference_pnetlin(reference_networks_basic):
    """Reference PNetLin (real slicing + shipped v0.1 alex lin weights, stub
    random backbone) == our LPIPS through the alexnet converter."""
    _lpips_ab("alex", reference_networks_basic, tol=1e-4)


def test_lpips_vgg_matches_reference_pnetlin(reference_networks_basic):
    _lpips_ab("vgg", reference_networks_basic, tol=1e-4)


# ---------------------------------------------------------------------------
# InceptionV3 block-level numerical A/B (torch replicas, random weights)
# ---------------------------------------------------------------------------


class TorchBasicConv2d(nn.Module):
    """torchvision.models.inception.BasicConv2d semantics: conv(no bias) ->
    BN(eps=0.001) -> relu."""

    def __init__(self, c_in, c_out, **conv_kwargs):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, bias=False, **conv_kwargs)
        self.bn = nn.BatchNorm2d(c_out, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchInceptionA(nn.Module):
    """torchvision InceptionA with pytorch_fid's count_include_pad=False
    average pool (FIDInceptionA)."""

    def __init__(self, c_in, pool_features):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(c_in, 64, kernel_size=1)
        self.branch5x5_1 = TorchBasicConv2d(c_in, 48, kernel_size=1)
        self.branch5x5_2 = TorchBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TorchBasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TorchBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TorchBasicConv2d(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = nn.functional.avg_pool2d(
            x, kernel_size=3, stride=1, padding=1, count_include_pad=False
        )
        bp = self.branch_pool(bp)
        return torch.cat([b1, b5, b3, bp], 1)


class TorchInceptionC(nn.Module):
    def __init__(self, c_in, c7):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7_1 = TorchBasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7_2 = TorchBasicConv2d(
            c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TorchBasicConv2d(
            c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TorchBasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = TorchBasicConv2d(
            c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TorchBasicConv2d(
            c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TorchBasicConv2d(
            c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TorchBasicConv2d(
            c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TorchBasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_2(bd)
        bd = self.branch7x7dbl_3(bd)
        bd = self.branch7x7dbl_4(bd)
        bd = self.branch7x7dbl_5(bd)
        bp = nn.functional.avg_pool2d(
            x, kernel_size=3, stride=1, padding=1, count_include_pad=False
        )
        bp = self.branch_pool(bp)
        return torch.cat([b1, b7, bd, bp], 1)


class TorchInceptionE(nn.Module):
    """pytorch_fid FIDInceptionE_1 (avg pool, count_include_pad=False) /
    FIDInceptionE_2 (max pool)."""

    def __init__(self, c_in, use_max_pool=False):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = TorchBasicConv2d(c_in, 320, kernel_size=1)
        self.branch3x3_1 = TorchBasicConv2d(c_in, 384, kernel_size=1)
        self.branch3x3_2a = TorchBasicConv2d(
            384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TorchBasicConv2d(
            384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TorchBasicConv2d(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(
            448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TorchBasicConv2d(
            384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TorchBasicConv2d(
            384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TorchBasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            bp = nn.functional.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:
            bp = nn.functional.avg_pool2d(
                x, kernel_size=3, stride=1, padding=1, count_include_pad=False
            )
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


def _block_ab(torch_block, flax_module, block_name, c_in, hw=17, tol=2e-5,
              seed=3):
    """Random-weight numerical A/B: torch block state dict -> namespaced
    torchvision-style keys -> load_torch_inception_v3 -> flax block apply."""
    from synthesis_in_style_tpu.models.inception_v3 import (
        load_torch_inception_v3,
    )

    torch.manual_seed(seed)
    randomize_bn(torch, torch_block, seed=seed)
    torch_block.eval()
    rng = np.random.RandomState(seed)
    x = rng.randn(2, c_in, hw, hw).astype("f4")
    with torch.no_grad():
        ref = torch_block(torch.from_numpy(x)).numpy()

    sd = {
        f"{block_name}.{k}": np.asarray(v)
        for k, v in torch_block.state_dict().items()
        if "num_batches_tracked" not in k
    }
    variables = load_torch_inception_v3(sd)
    got = flax_module.apply(
        {
            "params": variables["params"][block_name],
            "batch_stats": variables["batch_stats"][block_name],
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=0, atol=tol)


def test_inception_a_block_numerical():
    from synthesis_in_style_tpu.models.inception_v3 import InceptionA

    _block_ab(TorchInceptionA(192, 32), InceptionA(32), "Mixed_5b", 192)


def test_inception_c_block_numerical():
    from synthesis_in_style_tpu.models.inception_v3 import InceptionC

    _block_ab(TorchInceptionC(768, 128), InceptionC(128), "Mixed_6b", 768,
              hw=9)


def test_inception_e_avg_and_max_variants_numerical():
    from synthesis_in_style_tpu.models.inception_v3 import InceptionE

    _block_ab(TorchInceptionE(1280), InceptionE(), "Mixed_7b", 1280, hw=8)
    _block_ab(
        TorchInceptionE(1280, use_max_pool=True),
        InceptionE(use_max_pool=True),
        "Mixed_7c",
        1280,
        hw=8,
    )


def test_inception_stem_strided_conv_numerical():
    """The stem's stride-2 VALID conv — padding/stride layout through the
    converter."""
    from synthesis_in_style_tpu.models.inception_v3 import (
        BasicConv,
        load_torch_inception_v3,
    )

    torch.manual_seed(5)
    block = TorchBasicConv2d(3, 32, kernel_size=3, stride=2)
    randomize_bn(torch, block, seed=5)
    block.eval()
    x = np.random.RandomState(5).randn(2, 3, 75, 75).astype("f4")
    with torch.no_grad():
        ref = block(torch.from_numpy(x)).numpy()
    sd = {
        f"Conv2d_1a_3x3.{k}": np.asarray(v)
        for k, v in block.state_dict().items()
        if "num_batches_tracked" not in k
    }
    variables = load_torch_inception_v3(sd)
    got = BasicConv(32, (3, 3), strides=(2, 2)).apply(
        {
            "params": variables["params"]["Conv2d_1a_3x3"],
            "batch_stats": variables["batch_stats"]["Conv2d_1a_3x3"],
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=0, atol=2e-5
    )


def test_preprocess_matches_torch_bilinear_resize():
    """Grid-size handling: jax.image.resize('bilinear') == pytorch_fid's
    F.interpolate(..., mode='bilinear', align_corners=False)."""
    from synthesis_in_style_tpu.models.inception_v3 import preprocess

    x = np.random.RandomState(7).uniform(-1, 1, (2, 64, 80, 3)).astype("f4")
    ref = (
        nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(299, 299),
            mode="bilinear",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(preprocess(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

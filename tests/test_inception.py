"""InceptionV3 feature extractor: shapes, converter structure (reference
FID backbone, evaluation/fid.py:37-41)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.models.inception_v3 import (

    InceptionV3Features,
    avg_pool_no_pad,
    init_inception,
    load_torch_inception_v3,
    make_inception_feature_fn,
    preprocess,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



def test_avg_pool_no_pad_counts_valid_only():
    x = jnp.ones((1, 4, 4, 1))
    out = avg_pool_no_pad(x)
    # with count_include_pad=False a constant input stays constant
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_inception_feature_shape():
    model, variables = init_inception()
    x = jnp.zeros((2, 299, 299, 3))
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)


def test_feature_fn_resizes():
    fn = make_inception_feature_fn()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    feats = fn(x)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_torch_converter_structure():
    """Build a fake torch state dict with the real key names (shapes taken
    from our random-init params) and check the conversion lands leaf-exact."""
    _, variables = init_inception()
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    rng = np.random.default_rng(0)
    sd = {}
    for path, value in flat.items():
        parts = path.split("/")
        prefix = ".".join(parts[:-2])  # drop conv|bn / kernel|scale|bias
        if parts[-2] == "conv":
            out_c = value.shape[-1]
            in_c = value.shape[-2]
            kh, kw = value.shape[0], value.shape[1]
            sd[f"{prefix}.conv.weight"] = rng.normal(
                size=(out_c, in_c, kh, kw)
            ).astype(np.float32)
        else:
            c = value.shape[0]
            sd.setdefault(f"{prefix}.bn.weight", np.ones(c, np.float32))
            sd.setdefault(f"{prefix}.bn.bias", np.zeros(c, np.float32))
            sd.setdefault(f"{prefix}.bn.running_mean", np.zeros(c, np.float32))
            sd.setdefault(f"{prefix}.bn.running_var", np.ones(c, np.float32))

    converted = load_torch_inception_v3(sd)
    model = InceptionV3Features()
    feats = model.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        preprocess(jnp.zeros((1, 64, 64, 3))),
    )
    assert feats.shape == (1, 2048)
    # spot check one kernel landed transposed correctly
    np.testing.assert_array_equal(
        converted["params"]["Conv2d_1a_3x3"]["conv"]["kernel"],
        sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0),
    )

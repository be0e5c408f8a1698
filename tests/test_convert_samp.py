"""SAMP-Net checkpoint converter test: a synthetic torch-layout state dict
(checkpoint-exact shapes) must map onto the flax tree and run a forward."""

import numpy as np
import pytest


def synth_samp_state_dict():
    """State dict with the CADB checkpoint's names and shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    # backbone: Sequential(resnet18 children[:-2]) -> 0=conv1, 1=bn1, 4..7=layers
    sd["backbone.0.weight"] = t((64, 3, 7, 7))
    add_bn("backbone.1", 64)
    feats = [64, 128, 256, 512]
    for stage in range(4):
        c_out = feats[stage]
        c_in = feats[stage - 1] if stage else 64
        for block in range(2):
            tp = f"backbone.{stage + 4}.{block}"
            cin = c_in if block == 0 else c_out
            sd[f"{tp}.conv1.weight"] = t((c_out, cin, 3, 3))
            add_bn(f"{tp}.bn1", c_out)
            sd[f"{tp}.conv2.weight"] = t((c_out, c_out, 3, 3))
            add_bn(f"{tp}.bn2", c_out)
            if block == 0 and stage > 0:
                sd[f"{tp}.downsample.0.weight"] = t((c_out, c_in, 1, 1))
                add_bn(f"{tp}.downsample.1", c_out)

    # pattern convs: checkpoint-exact input channels + kernels
    shapes = [(1296, (2, 1)), (1296, (1, 2)), (1373, (2, 1)), (1373, (2, 1)),
              (1296, (2, 1)), (1296, (2, 2)), (1324, (2, 2)), (836, (3, 3))]
    for i, (cin, k) in enumerate(shapes):
        sd[f"pattern_module.conv_list.{i}.0.weight"] = t((1024, cin, *k))

    sd["pattern_weight_layer.3.weight"] = t((8, 512))
    sd["att_feature_layer.0.weight"] = t((512, 1024))
    sd["att_pred_layer.0.weight"] = t((6, 512))
    sd["com_pred_layer.0.weight"] = t((1024, 1024))
    sd["com_pred_layer.3.weight"] = t((512, 1024))
    sd["com_pred_layer.5.weight"] = t((5, 512))
    return sd


def test_convert_and_forward():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.convert import convert_samp_net
    from facet_tpu.models.samp_net import SAMPNet

    tree = convert_samp_net(synth_samp_state_dict())
    model = SAMPNet()
    # converted tree must be structurally complete: forward without init
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    sal = jnp.asarray(rng.uniform(0, 1, (1, 224, 224, 1)).astype(np.float32))
    pw, attrs, dist = model.apply(tree, img, sal)
    assert pw.shape == (1, 8)
    assert attrs.shape == (1, 6)
    assert dist.shape == (1, 5)
    assert np.isfinite(np.asarray(dist)).all()
    np.testing.assert_allclose(np.asarray(dist).sum(), 1.0, atol=1e-5)


def test_structure_matches_init():
    """Converted param tree paths == freshly-initialized tree paths."""
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.convert import convert_samp_net, flatten_tree
    from facet_tpu.models.samp_net import SAMPNet

    converted = flatten_tree(convert_samp_net(synth_samp_state_dict()))
    init = SAMPNet().init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 224, 224, 3), jnp.float32),
                          jnp.zeros((1, 224, 224, 1), jnp.float32))
    init_flat = flatten_tree(jax.tree.map(np.asarray, init))
    assert set(converted) == set(init_flat)
    for key in converted:
        assert converted[key].shape == init_flat[key].shape, key

"""ResNet50 backbone converter: synthetic torchvision-layout state dict must
map structurally onto ResNet50Stages (TOPIQ / HyperIQA backbones)."""

import numpy as np


def synth_resnet50_state_dict():
    rng = np.random.default_rng(0)
    sd = {}

    def t(shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = t((64, 3, 7, 7))
    add_bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    feats = (64, 128, 256, 512)
    in_c = 64
    for stage, (nblocks, c) in enumerate(zip(blocks, feats), start=1):
        for b in range(nblocks):
            tp = f"layer{stage}.{b}"
            cin = in_c if b == 0 else c * 4
            sd[f"{tp}.conv1.weight"] = t((c, cin, 1, 1))
            add_bn(f"{tp}.bn1", c)
            sd[f"{tp}.conv2.weight"] = t((c, c, 3, 3))
            add_bn(f"{tp}.bn2", c)
            sd[f"{tp}.conv3.weight"] = t((c * 4, c, 1, 1))
            add_bn(f"{tp}.bn3", c * 4)
            if b == 0:
                sd[f"{tp}.downsample.0.weight"] = t((c * 4, cin, 1, 1))
                add_bn(f"{tp}.downsample.1", c * 4)
        in_c = c * 4
    return sd


def test_structure_matches_init():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.convert import convert_torchvision_resnet50, flatten_tree
    from facet_tpu.models.topiq import ResNet50Stages

    params, stats = convert_torchvision_resnet50(synth_resnet50_state_dict())
    converted = flatten_tree({"params": params, "batch_stats": stats})

    init = ResNet50Stages().init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 96, 96, 3), jnp.float32))
    init_flat = flatten_tree(jax.tree.map(np.asarray, init))
    assert set(converted) == set(init_flat)
    for key in converted:
        assert converted[key].shape == init_flat[key].shape, key

    # and the converted tree actually forwards
    stages = ResNet50Stages().apply({"params": params, "batch_stats": stats},
                                    jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert stages[-1].shape[-1] == 2048
    assert all(np.isfinite(np.asarray(s)).all() for s in stages)

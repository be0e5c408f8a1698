"""TOPIQ converter round-trip: synthetic pyiqa-layout checkpoint -> flax.

The synthetic state dict uses exact timm resnet50 names for the backbone
(the bulk of the checkpoint) and the transcribed CFANet head layout from
docs/CONVERTERS.md. The converted tree must merge losslessly into the
module's init structure and produce a valid forward.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_sd():
    from facet_tpu.models.convert import synthetic_topiq_state_dict

    return synthetic_topiq_state_dict(np.random.default_rng(11))


class TestTOPIQConverter:
    def test_roundtrip_structure(self, synthetic_sd):
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_topiq, merge_into_init
        from facet_tpu.models.topiq import TOPIQNet

        tree, unmapped = convert_topiq(synthetic_sd)
        assert unmapped == [], unmapped  # every source key consumed

        net = TOPIQNet()
        init = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 96, 96, 3), jnp.float32))
        merged, missing, extra = merge_into_init(init, tree)
        assert extra == [], extra  # nothing converted that the module lacks
        # only the pool_norm LayerNorm has no source key (kept at identity)
        assert all("pool_norm" in path for path in missing), missing

    def test_converted_forward_runs(self, synthetic_sd):
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_topiq, merge_into_init
        from facet_tpu.models.topiq import TOPIQNet

        tree, _ = convert_topiq(synthetic_sd)
        net = TOPIQNet()
        init = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 96, 96, 3), jnp.float32))
        merged, _, _ = merge_into_init(init, tree)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
        out = np.asarray(net.apply(merged, jnp.asarray(x)))
        assert out.shape == (2,)
        assert np.all((out >= 0) & (out <= 1))
        # conversion actually changed the parameters (not a no-op merge)
        base = np.asarray(net.apply(init, jnp.asarray(x)))
        assert not np.allclose(out, base)

    def test_backbone_mapping_is_torchvision_exact(self, synthetic_sd):
        """The semantic_model.* subset must satisfy the (already verified)
        torchvision resnet50 converter contract."""
        from facet_tpu.models.convert import convert_torchvision_resnet50

        backbone = {k[len("semantic_model."):]: v
                    for k, v in synthetic_sd.items()
                    if k.startswith("semantic_model.")}
        params, stats = convert_torchvision_resnet50(backbone)
        assert "Conv_0" in params and "layer4_2" in params
        assert params["layer1_0"]["down_conv"]["kernel"].shape == (1, 1, 64, 256)

"""Qwen2.5-VL vision tower: numeric parity vs the installed transformers
implementation (random-init tiny config — no weights downloaded)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_torch_vision(tiny):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = Qwen2_5_VLVisionConfig(
        depth=tiny.depth, hidden_size=tiny.hidden_size,
        intermediate_size=tiny.intermediate_size, num_heads=tiny.num_heads,
        in_channels=tiny.in_channels, patch_size=tiny.patch_size,
        spatial_merge_size=tiny.spatial_merge_size,
        temporal_patch_size=tiny.temporal_patch_size,
        window_size=tiny.window_size,
        fullatt_block_indexes=list(tiny.fullatt_block_indexes),
        out_hidden_size=tiny.out_hidden_size, hidden_act="silu",
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def tiny_config():
    from facet_tpu.models.qwen_vision import QwenVisionConfig

    return QwenVisionConfig(
        hidden_size=32, out_hidden_size=48, intermediate_size=64,
        num_heads=2, depth=4, in_channels=3, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, window_size=16,
        fullatt_block_indexes=(2,))


def run_parity(tiny, grid_h, grid_w, atol=2e-4):
    import jax.numpy as jnp

    from facet_tpu.models.qwen_vision import (
        QwenVisionTower,
        convert_qwen_vision,
    )

    model = make_torch_vision(tiny)
    seq = grid_h * grid_w
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((seq, tiny.patch_dim)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(patches),
                     grid_thw=torch.tensor([[1, grid_h, grid_w]])).numpy()

    sd = {f"visual.{k}": v.numpy() for k, v in model.state_dict().items()}
    params = convert_qwen_vision(sd, tiny)
    tower = QwenVisionTower(tiny, grid_h, grid_w)
    got = np.asarray(tower.apply(params, jnp.asarray(patches)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


class TestQwenVisionParity:
    def test_whole_window_grid(self, tiny_config):
        # 8x12 patches -> 4x6 cells -> 2x3 whole windows (no padding)
        run_parity(tiny_config, 8, 12)

    def test_padded_window_grid(self, tiny_config):
        # 10x8 patches -> 5x4 cells -> pad to 6x4 (window padding exercised)
        run_parity(tiny_config, 10, 8)

    def test_encoder_multi_image(self, tiny_config):
        """QwenVisionEncoder handles multiple grids in one call, matching
        the torch tower per image segment."""
        import jax.numpy as jnp  # noqa: F401

        from facet_tpu.models.qwen_vision import (
            QwenVisionEncoder,
            convert_qwen_vision,
        )

        model = make_torch_vision(tiny_config)
        sd = {f"visual.{k}": v.numpy() for k, v in model.state_dict().items()}
        encoder = QwenVisionEncoder(convert_qwen_vision(sd, tiny_config),
                                    tiny_config)
        rng = np.random.default_rng(4)
        grids = [(1, 8, 12), (1, 4, 8)]
        seqs = [t * h * w for t, h, w in grids]
        patches = rng.standard_normal(
            (sum(seqs), tiny_config.patch_dim)).astype(np.float32)
        got = encoder.encode(patches, grids)
        offset = 0
        wants = []
        for (t, h, w), seq in zip(grids, seqs):
            with torch.no_grad():
                wants.append(model(torch.from_numpy(patches[offset:offset + seq]),
                                   grid_thw=torch.tensor([[t, h, w]])).numpy())
            offset += seq
        want = np.concatenate(wants, axis=0)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_converter_consumes_all_keys(self, tiny_config):
        model = make_torch_vision(tiny_config)
        from facet_tpu.models.qwen_vision import convert_qwen_vision

        sd = {f"visual.{k}": v.numpy() for k, v in model.state_dict().items()}
        tree = convert_qwen_vision(sd, tiny_config)
        import jax

        n_converted = len(jax.tree.leaves(tree))
        n_source = len([k for k in sd if "rotary" not in k])
        assert n_converted == n_source  # rope buffers excluded, rest mapped

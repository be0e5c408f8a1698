"""Qwen3-VL vision tower + text decoder: numeric and greedy-generate
parity vs the installed transformers implementation (random-init tiny
configs — no weights needed)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("transformers.models.qwen3_vl")


def tiny_vision_cfgs():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLVisionConfig,
    )

    from facet_tpu.models.qwen3_vision import Qwen3VisionConfig

    hf = Qwen3VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=48, num_heads=2,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=64,
        num_position_embeddings=16, deepstack_visual_indexes=[0, 2],
        hidden_act="gelu_pytorch_tanh")
    ours = Qwen3VisionConfig(
        hidden_size=32, out_hidden_size=64, intermediate_size=48,
        num_heads=2, depth=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, num_position_embeddings=16,
        deepstack_visual_indexes=(0, 2))
    return hf, ours


def tiny_text_cfgs():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLTextConfig,
    )

    from facet_tpu.models.qwen3_text import Qwen3TextConfig

    hf = Qwen3VLTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=1e4,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                      "mrope_interleaved": True},
        tie_word_embeddings=True, max_position_embeddings=512)
    ours = Qwen3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=1e4, mrope_section=(4, 2, 2), tie_word_embeddings=True,
        n_deepstack=2)
    return hf, ours


class TestVisionParity:
    def test_tower_matches_torch(self):
        from transformers.models.qwen3_vl.modeling_qwen3_vl import (
            Qwen3VLVisionModel,
        )

        from facet_tpu.models.qwen3_vision import (
            Qwen3VisionTower,
            convert_qwen3_vision,
        )

        hf_cfg, our_cfg = tiny_vision_cfgs()
        hf_cfg._attn_implementation = "eager"
        torch.manual_seed(0)
        model = Qwen3VLVisionModel(hf_cfg).eval().float()

        gh = gw = 8
        rng = np.random.default_rng(0)
        patches = rng.standard_normal(
            (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
        grid = torch.tensor([[1, gh, gw]])
        with torch.no_grad():
            want_main, want_deep = model(torch.from_numpy(patches), grid)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        tree = convert_qwen3_vision(sd, our_cfg)
        tower = Qwen3VisionTower(our_cfg, gh, gw)
        got_main, got_deep = tower.apply(tree, patches)

        np.testing.assert_allclose(np.asarray(got_main),
                                   want_main.numpy(), atol=2e-4, rtol=1e-3)
        assert len(got_deep) == len(want_deep) == 2
        for g, w in zip(got_deep, want_deep):
            np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                       atol=2e-4, rtol=1e-3)


class TestTextParity:
    def test_forward_logits_match(self):
        from transformers.models.qwen3_vl.modeling_qwen3_vl import (
            Qwen3VLTextModel,
        )

        from facet_tpu.models.qwen3_text import (
            Qwen3TextModel,
            convert_qwen3_text,
            embed_tokens,
        )

        hf_cfg, our_cfg = tiny_text_cfgs()
        hf_cfg._attn_implementation = "eager"
        torch.manual_seed(0)
        model = Qwen3VLTextModel(hf_cfg).eval().float()
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_qwen3_text(sd, our_cfg)

        b, t = 2, 7
        rng = np.random.default_rng(0)
        ids = rng.integers(0, our_cfg.vocab_size, (b, t))
        pos = np.stack([rng.integers(0, 30, (b, t)) for _ in range(3)])
        with torch.no_grad():
            hidden = model(
                input_ids=torch.from_numpy(ids),
                position_ids=torch.from_numpy(pos),
            ).last_hidden_state.numpy()

        fm = Qwen3TextModel(our_cfg)
        embeds = embed_tokens(params, np.asarray(ids))
        mask = np.tril(np.ones((t, t), bool))[None].repeat(b, 0)
        logits, _ = fm.apply(params, embeds, np.asarray(pos), mask)
        table = params["params"]["embed_tokens"]["embedding"]
        want = hidden @ np.asarray(table).T
        np.testing.assert_allclose(np.asarray(logits), want,
                                   atol=2e-4, rtol=1e-3)


class TestEndToEnd:
    def test_device_generate_matches_full_vlm(self):
        """flax vision encode + deepstack + KV-cache greedy decode ==
        torch Qwen3VLForConditionalGeneration.generate (tiny)."""
        from transformers.models.qwen3_vl.configuration_qwen3_vl import (
            Qwen3VLConfig,
        )
        from transformers.models.qwen3_vl.modeling_qwen3_vl import (
            Qwen3VLForConditionalGeneration,
        )

        from facet_tpu.models.qwen3_text import (
            Qwen3TextDecoder,
            convert_qwen3_text,
            embed_tokens,
            rope_index_batch,
        )
        from facet_tpu.models.qwen3_vision import (
            Qwen3VisionEncoder,
            convert_qwen3_vision,
        )

        hf_v, our_v = tiny_vision_cfgs()
        hf_t, our_t = tiny_text_cfgs()
        image_token = 120
        cfg = Qwen3VLConfig(
            text_config=hf_t.to_dict(), vision_config=hf_v.to_dict(),
            image_token_id=image_token, video_token_id=121,
            vision_start_token_id=122, vision_end_token_id=123)
        cfg._attn_implementation = "eager"
        torch.manual_seed(1)
        model = Qwen3VLForConditionalGeneration(cfg).eval().float()

        gh = gw = 8                      # 8x8 patches -> 16 merged tokens
        n_img = (gh // 2) * (gw // 2)
        ids = np.array([[3, 4, 122] + [image_token] * n_img + [7, 8]])
        rng = np.random.default_rng(3)
        patches = rng.standard_normal(
            (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
        grids = np.array([[1, gh, gw]])
        new = 5

        with torch.no_grad():
            want = model.generate(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(patches),
                image_grid_thw=torch.from_numpy(grids),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
                max_new_tokens=new,
                do_sample=False).numpy()[:, ids.shape[1]:]

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        encoder = Qwen3VisionEncoder(convert_qwen3_vision(sd, our_v), our_v)
        params = convert_qwen3_text(sd, our_t)
        decoder = Qwen3TextDecoder(params, our_t, max_new_tokens=new)

        vis_emb, deep = encoder.encode(patches, grids.tolist())
        embeds = np.array(embed_tokens(params, ids), np.float32)
        slots = np.nonzero(ids == image_token)
        embeds[slots[0], slots[1]] = vis_emb
        b, t, e = embeds.shape
        vis_mask = ids == image_token
        deep_feats = []
        for d in deep:
            feat = np.zeros((b, t, e), np.float32)
            feat[slots[0], slots[1]] = d
            deep_feats.append(feat)

        valid = np.ones(ids.shape, bool)
        pos, next_pos = rope_index_batch(ids, valid, grids, image_token)
        got = decoder.generate(embeds, valid, pos, next_pos,
                               np.asarray([0], np.int32),
                               vis_mask=vis_mask, deep_feats=deep_feats)
        np.testing.assert_array_equal(got, want)

    def test_rope_index_matches_transformers(self):
        from transformers.models.qwen3_vl.configuration_qwen3_vl import (
            Qwen3VLConfig,
        )
        from transformers.models.qwen3_vl.modeling_qwen3_vl import (
            Qwen3VLModel,
        )

        from facet_tpu.models.qwen3_text import rope_index_batch

        hf_v, _ = tiny_vision_cfgs()
        hf_t, _ = tiny_text_cfgs()
        cfg = Qwen3VLConfig(
            text_config=hf_t.to_dict(), vision_config=hf_v.to_dict(),
            image_token_id=120, video_token_id=121,
            vision_start_token_id=122, vision_end_token_id=123)
        cfg._attn_implementation = "eager"
        torch.manual_seed(0)
        model = Qwen3VLModel(cfg).eval()

        gh = gw = 4
        n_img = (gh // 2) * (gw // 2)
        ids = [5, 6, 122] + [120] * n_img + [8, 9]
        ids_t = torch.tensor([ids])
        grid = torch.tensor([[1, gh, gw]])
        want_pos, want_delta = model.get_rope_index(
            ids_t, image_grid_thw=grid,
            attention_mask=torch.ones_like(ids_t))
        got_pos, got_next = rope_index_batch(
            np.array([ids]), np.ones((1, len(ids)), bool),
            np.array([[1, gh, gw]]), 120)
        np.testing.assert_array_equal(got_pos, want_pos.numpy())
        assert got_next[0] == int(want_delta[0]) + len(ids)


class TestTensorParallel:
    """The ('dp','tp') GSPMD specs written for the 2.5 decoder apply to
    Qwen3 unchanged (same leaf names; the per-head q/k RMSNorm scales
    replicate) — generation must be token-identical to single-device."""

    def _generate(self, mesh, batch=4):
        import jax.numpy as jnp

        from facet_tpu.models.qwen3_text import (Qwen3TextDecoder,
                                                 init_text_params)

        _, cfg = tiny_text_cfgs()
        _, params = init_text_params(cfg, seed=5)
        rng = np.random.default_rng(11)
        t = 8
        embeds = rng.standard_normal((batch, t, cfg.hidden_size)) \
            .astype(np.float32) * 0.1
        pos = np.broadcast_to(np.arange(t), (3, batch, t)).copy()
        valid = np.ones((batch, t), bool)
        valid[0, :2] = False            # one left-padded row
        next_pos = np.full((batch,), t, np.int64)
        eos = np.asarray([cfg.vocab_size - 1], np.int32)
        dec = Qwen3TextDecoder(params, cfg, dtype=jnp.float32,
                               max_new_tokens=6, mesh=mesh)
        return dec.generate(embeds, valid, pos, next_pos, eos)

    def test_tp_matches_single_device(self):
        import jax

        from facet_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(dp=4, tp=2, devices=tuple(jax.devices()[:8]))
        want = self._generate(None)
        got = self._generate(mesh)
        np.testing.assert_array_equal(got, want)

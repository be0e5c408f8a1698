"""Qwen2.5-VL text decoder: numeric + greedy-generate parity vs the
installed transformers implementation (random-init tiny config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_torch_text(tiny):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLTextConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLTextModel,
    )

    cfg = Qwen2_5_VLTextConfig(
        vocab_size=tiny.vocab_size, hidden_size=tiny.hidden_size,
        intermediate_size=tiny.intermediate_size,
        num_hidden_layers=tiny.num_layers,
        num_attention_heads=tiny.num_heads,
        num_key_value_heads=tiny.num_kv_heads,
        rms_norm_eps=tiny.rms_norm_eps, rope_theta=tiny.rope_theta,
        rope_scaling={"type": "mrope",
                      "mrope_section": list(tiny.mrope_section)},
        tie_word_embeddings=tiny.tie_word_embeddings,
        max_position_embeddings=512, use_sliding_window=False,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    return Qwen2_5_VLTextModel(cfg).eval().float(), cfg


@pytest.fixture(scope="module")
def tiny_config():
    from facet_tpu.models.qwen_text import QwenTextConfig

    # head_dim 16 -> mrope sections (4, 2, 2) (x2 halves cover 16)
    return QwenTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_layers=3, num_heads=4, num_kv_heads=2,
        mrope_section=(4, 2, 2), rope_theta=1e4, tie_word_embeddings=True)


def _convert(model, tiny):
    from facet_tpu.models.qwen_text import convert_qwen_text

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return convert_qwen_text(sd, tiny)


class TestQwenTextParity:
    def test_forward_logits_match(self, tiny_config):
        import jax.numpy as jnp

        from facet_tpu.models.qwen_text import QwenTextModel, embed_tokens

        model, _ = make_torch_text(tiny_config)
        params = _convert(model, tiny_config)
        b, t = 2, 7
        rng = np.random.default_rng(0)
        ids = rng.integers(0, tiny_config.vocab_size, (b, t))
        # distinct t/h/w streams exercise the mrope section interleave
        pos = np.stack([rng.integers(0, 30, (b, t)) for _ in range(3)])

        with torch.no_grad():
            hidden = model(
                input_ids=torch.from_numpy(ids),
                position_ids=torch.from_numpy(pos),
            ).last_hidden_state.numpy()

        fm = QwenTextModel(tiny_config)
        embeds = embed_tokens(params, jnp.asarray(ids))
        mask = np.tril(np.ones((t, t), bool))[None].repeat(b, 0)
        logits, _ = fm.apply(params, embeds, jnp.asarray(pos),
                             jnp.asarray(mask))
        # compare pre-head hidden via the tied head: logits = h @ E^T; the
        # torch text model returns hidden states, so project for comparison
        table = params["params"]["embed_tokens"]["embedding"]
        want = hidden @ np.asarray(table).T
        np.testing.assert_allclose(np.asarray(logits), want,
                                   atol=2e-4, rtol=1e-3)

    def test_cache_decode_matches_full_forward(self, tiny_config):
        """Prefill + single-token cached steps == one full forward."""
        import jax.numpy as jnp

        from facet_tpu.models.qwen_text import QwenTextModel, embed_tokens

        model, _ = make_torch_text(tiny_config)
        params = _convert(model, tiny_config)
        fm = QwenTextModel(tiny_config)
        b, t_full, t_pre = 2, 6, 4
        rng = np.random.default_rng(1)
        ids = rng.integers(0, tiny_config.vocab_size, (b, t_full))
        pos = np.broadcast_to(np.arange(t_full), (3, b, t_full)).copy()

        embeds = embed_tokens(params, jnp.asarray(ids))
        full_mask = np.tril(np.ones((t_full, t_full), bool))[None].repeat(b, 0)
        want, _ = fm.apply(params, embeds, jnp.asarray(pos),
                           jnp.asarray(full_mask))

        cfg = tiny_config
        cache = [{"k": jnp.zeros((b, t_full, cfg.num_kv_heads, cfg.head_dim)),
                  "v": jnp.zeros((b, t_full, cfg.num_kv_heads, cfg.head_dim))}
                 for _ in range(cfg.num_layers)]
        pre_mask = np.zeros((b, t_pre, t_full), bool)
        pre_mask[:, :, :t_pre] = np.tril(np.ones((t_pre, t_pre), bool))
        got_pre, cache = fm.apply(params, embeds[:, :t_pre],
                                  jnp.asarray(pos[:, :, :t_pre]),
                                  jnp.asarray(pre_mask), cache, 0)
        np.testing.assert_allclose(np.asarray(got_pre),
                                   np.asarray(want[:, :t_pre]),
                                   atol=1e-4, rtol=1e-3)
        for step in range(t_pre, t_full):
            mask = np.zeros((b, 1, t_full), bool)
            mask[:, 0, :step + 1] = True
            got, cache = fm.apply(
                params, embeds[:, step:step + 1],
                jnp.asarray(pos[:, :, step:step + 1]),
                jnp.asarray(mask), cache, step)
            np.testing.assert_allclose(
                np.asarray(got[:, 0]), np.asarray(want[:, step]),
                atol=1e-4, rtol=1e-3)

    def test_greedy_generate_matches_transformers(self, tiny_config):
        """QwenTextDecoder.generate == HF greedy decoding (text-only)."""
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLTextModel,
        )

        from facet_tpu.models.qwen_text import (
            QwenTextDecoder,
            embed_tokens,
            text_rope_index,
        )

        model, cfg_t = make_torch_text(tiny_config)
        params = _convert(model, tiny_config)
        table = torch.from_numpy(
            np.asarray(params["params"]["embed_tokens"]["embedding"]))

        b, t, new = 2, 5, 6
        rng = np.random.default_rng(2)
        ids = rng.integers(2, tiny_config.vocab_size, (b, t))

        # reference greedy loop through the torch model (tied head)
        cur = torch.from_numpy(ids)
        want = []
        with torch.no_grad():
            for _ in range(new):
                tt = cur.shape[1]
                pos = torch.arange(tt)[None, None].expand(3, b, tt)
                h = model(input_ids=cur, position_ids=pos).last_hidden_state
                logits = h[:, -1] @ table.T
                nxt = logits.argmax(-1)
                want.append(nxt.numpy().copy())
                cur = torch.cat([cur, nxt[:, None]], dim=1)
        want = np.stack(want, axis=1)

        dec = QwenTextDecoder(params, tiny_config, max_new_tokens=new)
        pos, next_pos = text_rope_index(ids, [[] for _ in range(b)])
        embeds = np.asarray(embed_tokens(params, ids))
        got = dec.generate(embeds, np.ones((b, t), bool), pos, next_pos,
                           eos_ids=np.array([0], np.int32))
        np.testing.assert_array_equal(got, want)

    def test_rope_index_matches_transformers(self, tiny_config):
        """text_rope_index == Qwen2_5_VLModel.get_rope_index for an
        image+text prompt."""
        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
            Qwen2_5_VLConfig,
            Qwen2_5_VLTextConfig,
            Qwen2_5_VLVisionConfig,
        )
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLModel,
        )

        from facet_tpu.models.qwen_text import text_rope_index

        vis = Qwen2_5_VLVisionConfig(
            depth=1, hidden_size=32, intermediate_size=32, num_heads=2,
            patch_size=4, spatial_merge_size=2, window_size=16,
            fullatt_block_indexes=[0], out_hidden_size=64)
        txt = Qwen2_5_VLTextConfig(
            vocab_size=200, hidden_size=64, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
            max_position_embeddings=512)
        cfg = Qwen2_5_VLConfig(
            text_config=txt.to_dict(), vision_config=vis.to_dict(),
            image_token_id=151655, video_token_id=151656,
            vision_start_token_id=151652)
        cfg._attn_implementation = "eager"
        torch.manual_seed(0)
        model = Qwen2_5_VLModel(cfg).eval()

        # prompt: [text x3][vision_start][image x4][text x2] (4x4 grid,
        # merge 2 -> 4 image tokens)
        gh = gw = 4
        n_img = (gh // 2) * (gw // 2)
        ids = [5, 6, 7, 151652] + [151655] * n_img + [8, 9]
        ids_t = torch.tensor([ids])
        grid = torch.tensor([[1, gh, gw]])
        want_pos, want_delta = model.get_rope_index(
            ids_t, image_grid_thw=grid,
            attention_mask=torch.ones_like(ids_t))

        got_pos, got_next = text_rope_index(
            np.array([ids]), [[(4, 1, gh, gw)]])
        np.testing.assert_array_equal(got_pos, want_pos.numpy())
        # next_pos = max position + 1 = delta + seq_len
        assert got_next[0] == int(want_delta[0]) + len(ids)

    def test_rope_index_batch_left_padded(self, tiny_config):
        """rope_index_batch must place positions only on valid slots and
        match get_rope_index row-wise under left padding."""
        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
            Qwen2_5_VLConfig,
            Qwen2_5_VLTextConfig,
            Qwen2_5_VLVisionConfig,
        )
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLModel,
        )

        from facet_tpu.models.qwen_text import rope_index_batch

        vis = Qwen2_5_VLVisionConfig(
            depth=1, hidden_size=32, intermediate_size=32, num_heads=2,
            patch_size=4, spatial_merge_size=2, window_size=16,
            fullatt_block_indexes=[0], out_hidden_size=64)
        txt = Qwen2_5_VLTextConfig(
            vocab_size=200, hidden_size=64, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
            max_position_embeddings=512)
        cfg = Qwen2_5_VLConfig(
            text_config=txt.to_dict(), vision_config=vis.to_dict(),
            image_token_id=151655, video_token_id=151656,
            vision_start_token_id=151652)
        cfg._attn_implementation = "eager"
        torch.manual_seed(0)
        model = Qwen2_5_VLModel(cfg).eval()

        gh = gw = 4
        n_img = (gh // 2) * (gw // 2)
        row0 = [5, 6, 151652] + [151655] * n_img + [8, 9]
        row1 = [0, 0, 5, 151652] + [151655] * n_img + [9]  # left pad x2
        assert len(row0) == len(row1)
        ids = np.array([row0, row1])
        valid = np.array([[True] * len(row0),
                          [False, False] + [True] * (len(row1) - 2)])
        grids = np.array([[1, gh, gw], [1, gh, gw]])

        want_pos, _ = model.get_rope_index(
            torch.from_numpy(ids), image_grid_thw=torch.from_numpy(grids),
            attention_mask=torch.from_numpy(valid.astype(np.int64)))
        got_pos, _ = rope_index_batch(ids, valid, grids, 151655)
        # compare only the valid slots (pad-slot fill values are masked)
        for i in range(2):
            vi = np.nonzero(valid[i])[0]
            np.testing.assert_array_equal(got_pos[:, i, vi],
                                          want_pos.numpy()[:, i, vi])

    def test_device_generate_matches_full_vlm(self, tiny_config):
        """flax vision encode + embedding merge + KV-cache greedy decode ==
        torch Qwen2_5_VLForConditionalGeneration.generate (tiny, text ids
        built by hand — no tokenizer needed)."""
        import jax.numpy as jnp  # noqa: F401

        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
            Qwen2_5_VLConfig,
            Qwen2_5_VLTextConfig,
            Qwen2_5_VLVisionConfig,
        )
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLForConditionalGeneration,
        )

        from facet_tpu.models.qwen_text import (
            QwenTextConfig,
            QwenTextDecoder,
            convert_qwen_text,
            embed_tokens,
            rope_index_batch,
        )
        from facet_tpu.models.qwen_vision import (
            QwenVisionConfig,
            QwenVisionEncoder,
            convert_qwen_vision,
        )

        image_token = 190
        vis = Qwen2_5_VLVisionConfig(
            depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, window_size=16,
            fullatt_block_indexes=[1], out_hidden_size=64, hidden_act="silu")
        txt = Qwen2_5_VLTextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e4,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
            tie_word_embeddings=True, max_position_embeddings=512)
        cfg = Qwen2_5_VLConfig(
            text_config=txt.to_dict(), vision_config=vis.to_dict(),
            image_token_id=image_token, video_token_id=191,
            vision_start_token_id=192)
        cfg._attn_implementation = "eager"
        torch.manual_seed(1)
        model = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()

        gh = gw = 8                      # 8x8 patches -> 16 merged tokens
        n_img = (gh // 2) * (gw // 2)
        ids = np.array([[3, 4, 192] + [image_token] * n_img + [7, 8]])
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
                max_new_tokens=new, do_sample=False).numpy()[:, ids.shape[1]:]

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        vcfg = QwenVisionConfig(
            hidden_size=32, out_hidden_size=64, intermediate_size=48,
            num_heads=2, depth=2, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
        encoder = QwenVisionEncoder(convert_qwen_vision(sd), vcfg)
        tcfg = QwenTextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2,
            mrope_section=(4, 2, 2), rope_theta=1e4,
            tie_word_embeddings=True)
        params = convert_qwen_text(sd, tcfg)
        decoder = QwenTextDecoder(params, tcfg, max_new_tokens=new)

        vis_emb = encoder.encode(patches, grids.tolist())
        embeds = np.array(embed_tokens(params, ids), np.float32)
        slots = np.nonzero(ids == image_token)
        embeds[slots[0], slots[1]] = vis_emb
        valid = np.ones(ids.shape, bool)
        pos, next_pos = rope_index_batch(ids, valid, grids, image_token)
        got = decoder.generate(embeds, valid, pos, next_pos,
                               np.asarray([0], np.int32))
        np.testing.assert_array_equal(got, want)

    def test_converter_accepts_full_model_prefix(self, tiny_config):
        """Keys under model.language_model.* (transformers>=4.52 layout)
        convert identically to bare text-model keys."""
        model, _ = make_torch_text(tiny_config)
        from facet_tpu.models.qwen_text import convert_qwen_text

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        base = convert_qwen_text(sd, tiny_config)
        prefixed = {f"model.language_model.{k}": v for k, v in sd.items()}
        tree = convert_qwen_text(prefixed, tiny_config)
        import jax

        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(tree)):
            np.testing.assert_array_equal(a, b)


class TestTensorParallel:
    """The ('dp','tp') mesh path (parallel/tp.py): Megatron-style sharding
    specs over the unchanged decoder must reproduce the single-device
    greedy tokens exactly — GSPMD only changes where the math runs."""

    def _generate(self, tiny_config, mesh, batch):
        import dataclasses

        import jax.numpy as jnp

        from facet_tpu.models.qwen_text import (QwenTextDecoder,
                                                init_text_params)

        cfg = dataclasses.replace(tiny_config, tie_word_embeddings=False)
        _, params = init_text_params(cfg, seed=7)
        dec = QwenTextDecoder(params, cfg, dtype=jnp.float32,
                              max_new_tokens=6, mesh=mesh)
        rng = np.random.default_rng(3)
        t = 8
        embeds = rng.standard_normal(
            (batch, t, tiny_config.hidden_size)).astype(np.float32) * 0.1
        valid = np.ones((batch, t), bool)
        valid[0, :2] = False            # a left-padded row
        pos = np.broadcast_to(np.arange(t), (3, batch, t)).copy()
        next_pos = np.full((batch,), t, np.int64)
        eos = np.asarray([cfg.vocab_size - 1], np.int32)
        return dec.generate(embeds, valid, pos, next_pos, eos)

    def test_tp_matches_single_device(self, tiny_config):
        import jax

        from facet_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(dp=4, tp=2, devices=tuple(jax.devices()[:8]))
        want = self._generate(tiny_config, None, batch=4)
        got = self._generate(tiny_config, mesh, batch=4)
        np.testing.assert_array_equal(got, want)

    def test_tp_uneven_batch_replicates_dp(self, tiny_config):
        """batch=3 does not divide dp=4: inputs replicate, tp still shards."""
        import jax

        from facet_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(dp=4, tp=2, devices=tuple(jax.devices()[:8]))
        want = self._generate(tiny_config, None, batch=3)
        got = self._generate(tiny_config, mesh, batch=3)
        np.testing.assert_array_equal(got, want)

    def test_tp_validation_rejects_indivisible(self, tiny_config):
        import pytest as _pytest

        from facet_tpu.parallel.tp import validate_tp

        with _pytest.raises(ValueError):
            validate_tp(tiny_config, 3)   # kv_heads=2 not divisible by 3

    def test_hbm_accounting(self):
        """The 7B decoder must fit a 16 GB chip only after tp-sharding."""
        from facet_tpu.models.qwen_text import QwenTextConfig
        from facet_tpu.parallel.tp import decoder_hbm_gb

        full = decoder_hbm_gb(QwenTextConfig(), tp=1)
        half = decoder_hbm_gb(QwenTextConfig(), tp=2)
        assert full > 14.0          # bf16 7B decoder: no single-chip fit
        assert half < 8.5           # tp=2: fits with room for cache

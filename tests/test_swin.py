"""flax Swin (models/swin.py) numeric parity vs an independent
implementation (HF transformers' torch SwinModel), plus RAM++ net checks.

The RAM++ image encoder is a Swin-L; before real weights can confirm it,
this pins the architecture against transformers' own Swin at a reduced
config that still exercises every structural feature: multiple stages,
patch merging, relative position bias, and a SHIFTED window block
(stage 0 resolution 12 > window 6, so block 1 rolls and masks).
"""

import numpy as np
import pytest

pytest.importorskip("transformers")


def tiny_cfg():
    from facet_tpu.models.swin import SwinConfig

    return SwinConfig(image_size=48, patch_size=4, embed_dim=8,
                      depths=(2, 2), heads=(2, 4), window=6)


def hf_model(cfg):
    import torch  # noqa: F401
    from transformers import SwinConfig as HFConfig
    from transformers import SwinModel

    hf = SwinModel(HFConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size, num_channels=3,
        embed_dim=cfg.embed_dim, depths=list(cfg.depths),
        num_heads=list(cfg.heads), window_size=cfg.window,
        use_absolute_embeddings=False, hidden_act="gelu",
        drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0), add_pooling_layer=False).eval()
    # give every weight a non-trivial value
    rng = np.random.default_rng(3)
    with __import__("torch").no_grad():
        for p in hf.parameters():
            p.copy_(__import__("torch").from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.05))
    return hf


def hf_to_flax(hf, cfg):
    """HF swin state dict -> our SwinTransformer tree (the HF layout splits
    qkv; the published microsoft/ram layout fuses it — convert.py handles
    that one; this mapping covers the HF layout for the parity test)."""
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    t = lambda w: np.asarray(w, np.float32).T
    ln = lambda p: {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}
    tree = {
        "patch_proj": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"]
            .transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"]},
        "patch_norm": ln("embeddings.norm"),
        "norm": ln("layernorm"),
    }
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            p = f"encoder.layers.{i}.blocks.{j}."
            qkv_w = np.concatenate([sd[p + "attention.self.query.weight"],
                                    sd[p + "attention.self.key.weight"],
                                    sd[p + "attention.self.value.weight"]], 0)
            qkv_b = np.concatenate([sd[p + "attention.self.query.bias"],
                                    sd[p + "attention.self.key.bias"],
                                    sd[p + "attention.self.value.bias"]], 0)
            tree[f"layers{i}_block{j}"] = {
                "norm1": ln(p + "layernorm_before"),
                "attn": {
                    "qkv": {"kernel": t(qkv_w), "bias": qkv_b},
                    "proj": {"kernel": t(sd[p + "attention.output.dense.weight"]),
                             "bias": sd[p + "attention.output.dense.bias"]},
                    "relative_position_bias_table":
                        sd[p + "attention.self.relative_position_bias_table"],
                },
                "norm2": ln(p + "layernorm_after"),
                "fc1": {"kernel": t(sd[p + "intermediate.dense.weight"]),
                        "bias": sd[p + "intermediate.dense.bias"]},
                "fc2": {"kernel": t(sd[p + "output.dense.weight"]),
                        "bias": sd[p + "output.dense.bias"]},
            }
        if i < len(cfg.depths) - 1:
            p = f"encoder.layers.{i}.downsample."
            tree[f"layers{i}_downsample"] = {
                "norm": ln(p + "norm"),
                "reduction": {"kernel": t(sd[p + "reduction.weight"])},
            }
    return {"params": tree}


class TestSwinParity:
    def test_relative_position_index_matches_hf(self):
        from facet_tpu.models.swin import relative_position_index

        hf = hf_model(tiny_cfg())
        theirs = hf.state_dict()[
            "encoder.layers.0.blocks.0.attention.self.relative_position_index"]
        assert np.array_equal(relative_position_index(6),
                              theirs.numpy().astype(np.int32))

    def test_forward_matches_hf(self):
        import torch

        from facet_tpu.models.swin import SwinTransformer

        cfg = tiny_cfg()
        hf = hf_model(cfg)
        params = hf_to_flax(hf, cfg)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 48, 48, 3)).astype(np.float32)
        with torch.no_grad():
            expected = hf(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
        got = np.asarray(SwinTransformer(cfg).apply(params, x))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestRAMPlus:
    def test_converter_round_trip(self):
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import (convert_ram_plus,
                                              synthetic_ram_plus_state_dict)
        from facet_tpu.models.ram_plus import RAMPlusNet

        sd, cfg = synthetic_ram_plus_state_dict()
        tree, unmapped = convert_ram_plus(sd)
        assert unmapped == []
        net = RAMPlusNet(cfg)
        ref = net.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, cfg.swin.image_size,
                                  cfg.swin.image_size, 3)))
        ref_shapes = jax.tree_util.tree_map(lambda a: jnp.shape(a), ref)
        got_shapes = jax.tree_util.tree_map(lambda a: jnp.shape(a), tree)
        assert jax.tree_util.tree_structure(got_shapes) == \
            jax.tree_util.tree_structure(ref_shapes)
        assert got_shapes == ref_shapes

        logits = net.apply(tree, jnp.ones((2, cfg.swin.image_size,
                                           cfg.swin.image_size, 3)) * 0.5)
        assert logits.shape == (2, cfg.num_class)
        assert np.isfinite(np.asarray(logits)).all()

    def test_decode_tags(self):
        from facet_tpu.models.ram_plus import decode_tags

        logits = np.array([[4.0, -4.0, 2.0], [-4.0, -4.0, -4.0]])
        tags = decode_tags(logits, np.array([0.5, 0.5, 0.9]),
                           ["cat", "dog", "sky"])
        assert tags[0] == ["cat"]        # sky prob ~0.88 < its 0.9 threshold
        assert tags[1] == []

    def test_decode_tags_orders_by_strength(self):
        from facet_tpu.models.ram_plus import decode_tags

        logits = np.array([[1.0, 3.0, 2.0]])
        tags = decode_tags(logits, 0.5, ["a", "b", "c"], max_tags=2)
        assert tags[0] == ["b", "c"]


class TestRAMTaggerDeviceTier:
    def test_tags_through_flax_path(self, tmp_path, monkeypatch,
                                    scoring_config):
        """A converted ram_plus.npz + tag list + thresholds in the
        pretrained dir makes RAMTagger run fully on device (no torch)."""
        from facet_tpu.models import checkpoints
        from facet_tpu.models.convert import (convert_ram_plus, save_params,
                                              synthetic_ram_plus_state_dict)
        from facet_tpu.models.ram_tagger import RAMTagger

        sd, cfg = synthetic_ram_plus_state_dict()
        tree, _ = convert_ram_plus(sd)
        save_params(tree, tmp_path / "ram_plus.npz")
        vocab_tags = list(scoring_config.get_tag_vocabulary())
        tag_list = (vocab_tags * (cfg.num_class // len(vocab_tags) + 1)
                    )[:cfg.num_class]
        (tmp_path / "ram_tag_list.txt").write_text("\n".join(tag_list))
        # thresholds of 0 emit every tag -> mapping caps at max_tags
        (tmp_path / "ram_tag_list_threshold.txt").write_text(
            "\n".join(["-1.0"] * cfg.num_class))
        monkeypatch.setattr(checkpoints, "PRETRAINED_DIR", str(tmp_path))

        tagger = RAMTagger(scoring_config)
        tagger.image_size = cfg.swin.image_size
        assert tagger.ensure_loaded()
        assert tagger._net is not None and tagger._model is None

        from PIL import Image
        rng = np.random.default_rng(9)
        imgs = [Image.fromarray(rng.integers(0, 255, (60, 80, 3),
                                             dtype=np.uint8))
                for _ in range(3)]
        tags = tagger.tag_batch(imgs)
        assert len(tags) == 3
        for row in tags:
            assert 0 < len(row) <= tagger.max_tags
            assert all(t in vocab_tags for t in row)

    def test_tag_list_size_mismatch_raises(self, tmp_path, monkeypatch,
                                           scoring_config):
        from facet_tpu.models import checkpoints
        from facet_tpu.models.convert import (convert_ram_plus, save_params,
                                              synthetic_ram_plus_state_dict)
        from facet_tpu.models.ram_tagger import RAMTagger

        sd, cfg = synthetic_ram_plus_state_dict()
        tree, _ = convert_ram_plus(sd)
        save_params(tree, tmp_path / "ram_plus.npz")
        (tmp_path / "ram_tag_list.txt").write_text("only\ntwo\n")
        monkeypatch.setattr(checkpoints, "PRETRAINED_DIR", str(tmp_path))
        tagger = RAMTagger(scoring_config)
        tagger.image_size = cfg.swin.image_size
        with pytest.raises(RuntimeError, match="tag list"):
            tagger.ensure_loaded()

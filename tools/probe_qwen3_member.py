"""On-chip throughput of the Qwen3-VL-2B tagging member (round 5).

BASELINE.json config #3 ("16gb profile: TOPIQ + SAMP-Net + Qwen3-VL-2B
tagging, multi-pass mode") is the one member family bench.py has never
clocked: MULTICHIP runs prove TP token parity, but no tag-generation
img/s existed on the record (VERDICT r4 item 4).

This probe runs the PRODUCTION all-TPU path at full published dims
(models/qwen3_text.py / qwen3_vision.py defaults = the 2B checkpoint,
vision out_hidden 2048) with synthetic bf16 weights — the same arrays a
converted checkpoint would produce, minus the (egress-blocked) values —
and the exact device_generate dataflow (vlm_tagger.py:71-135): vision
encode + DeepStack -> embedding merge -> jitted KV-cache greedy decode.
The HF processor's host tokenization is replaced by directly-constructed
prompts (no tokenizer files without egress); its work is microseconds of
host string handling and does not affect device throughput.

Workload: the reference's Qwen3 vision budget (max_pixels = 512*28*28,
reference models/vlm_tagger.py:180) => a 40x52-patch grid (~520 merged
vision tokens, a 640x832 image), prompt padded to the 64-token bucket
like device_generate, batch = vlm_batch_size (scoring_config.json
qwen3_vl_2b: 4). Decode lengths measured: 100 new tokens (the config's
max_new_tokens — the worst case; random weights never emit EOS) and 32
(a typical comma-separated tag reply).

Prints one JSON line with tag-throughput img/s and tokens/s.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import facet_tpu  # noqa: E402,F401  (applies FACET_PLATFORM before jax init)


def host_bf16_params(module_init_shapes, seed):
    """Deterministic host bf16 tree matching an eval_shape structure —
    2-byte leaves halve the relay transfer vs f32 fallback_init."""
    import jax
    import ml_dtypes

    leaves, treedef = jax.tree_util.tree_flatten(module_init_shapes)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        scale = 0.02 if len(leaf.shape) >= 2 else 1e-3
        out.append((rng.standard_normal(leaf.shape) * scale).astype(
            ml_dtypes.bfloat16))
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4,
                        help="vlm_batch_size (scoring_config qwen3_vl_2b)")
    parser.add_argument("--grid", default="40x52",
                        help="vision patch grid per image (merge-2 cells "
                             "= gh*gw/4 tokens)")
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--tiny", action="store_true",
                        help="CPU smoke test: tiny dims, tiny grid")
    args = parser.parse_args()
    if args.tiny:
        args.grid = "8x8"
    gh, gw = (int(x) for x in args.grid.split("x"))

    import jax

    from facet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    jax.devices()
    t0 = time.monotonic()

    def phase(msg):
        print(f"[{time.monotonic() - t0:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    phase("backend ready")

    from facet_tpu.models.qwen3_text import (Qwen3TextConfig,
                                             Qwen3TextDecoder,
                                             Qwen3TextModel, embed_tokens,
                                             rope_index_batch)
    from facet_tpu.models.qwen3_vision import (Qwen3VisionConfig,
                                               Qwen3VisionEncoder,
                                               Qwen3VisionTower)

    if args.tiny:
        tcfg = Qwen3TextConfig(
            vocab_size=512, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            mrope_section=(4, 2, 2), rope_theta=1e4, n_deepstack=2)
        vcfg = Qwen3VisionConfig(
            hidden_size=48, out_hidden_size=64, intermediate_size=64,
            num_heads=4, depth=3, num_position_embeddings=64,
            deepstack_visual_indexes=(1, 2))
    else:
        tcfg = Qwen3TextConfig()                   # 2B dims
        vcfg = Qwen3VisionConfig(out_hidden_size=tcfg.hidden_size)  # 2B

    # ---- synthetic full-dim bf16 weights, host-generated (no threefry-
    # on-device programs — a known compile hazard on this chip)
    import dataclasses

    init_cfg = dataclasses.replace(tcfg, tie_word_embeddings=False)
    text_shapes = jax.eval_shape(
        lambda: Qwen3TextModel(init_cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, tcfg.hidden_size)),
            jnp.zeros((3, 1, 4), jnp.int32),
            jnp.zeros((1, 4, 4), bool)))
    tparams = host_bf16_params(text_shapes, seed=1)
    tree = dict(tparams["params"])
    tree["embed_tokens"] = {"embedding": tree.pop("lm_head")["kernel"].T
                            if "lm_head" in tree else None}
    if tree["embed_tokens"]["embedding"] is None or \
            tree["embed_tokens"]["embedding"].shape != (tcfg.vocab_size,
                                                        tcfg.hidden_size):
        import ml_dtypes

        rng = np.random.default_rng(7)
        tree["embed_tokens"] = {"embedding": (rng.standard_normal(
            (tcfg.vocab_size, tcfg.hidden_size)) * 0.02).astype(
                ml_dtypes.bfloat16)}
    tparams = {"params": tree}
    n_text = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tparams))
    phase(f"text params built ({n_text/1e9:.2f}B)")

    vshapes = jax.eval_shape(
        lambda: Qwen3VisionTower(vcfg, gh, gw).init(
            jax.random.PRNGKey(0), jnp.zeros((gh * gw, vcfg.patch_dim))))
    vparams = host_bf16_params(vshapes, seed=2)
    # vision runs f32 (like the conv members, docs/PERF.md bf16 rejection)
    vparams = jax.tree.map(lambda a: np.asarray(a, np.float32), vparams)
    n_vis = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(vparams))
    phase(f"vision params built ({n_vis/1e9:.2f}B)")

    # device-resident params, ONCE — the production path holds jnp device
    # arrays (vlm_tagger._load_device_path casts to bf16 on device); host
    # numpy trees would re-cross the relay on EVERY program call (first
    # probe run measured 187 s/encode from exactly that)
    tparams = jax.device_put(tparams)
    vparams = jax.device_put(vparams)
    for leaf in jax.tree_util.tree_leaves(vparams):
        leaf.block_until_ready()
    phase("params resident on device")

    encoder = Qwen3VisionEncoder(vparams, vcfg)

    # ---- prompt construction (device_generate's layout, host tokenizer
    # replaced): [text..., vision_start, image_pad * cells, vision_end,
    # question text...], padded to the 64 bucket
    image_token = 151655
    vision_start, vision_end = 151652, 151653
    cells = (gh // 2) * (gw // 2)
    rng = np.random.default_rng(0)
    text_tail = rng.integers(200, 50000, 88)       # ~ the tag-vocab prompt
    row = np.concatenate([[3], [vision_start], [image_token] * cells,
                          [vision_end], text_tail])
    bucket = -(-len(row) // 64) * 64
    ids = np.tile(np.pad(row, (0, bucket - len(row))), (args.batch, 1))
    valid = np.tile(np.pad(np.ones(len(row), bool),
                           (0, bucket - len(row))), (args.batch, 1))
    grids = np.tile([[1, gh, gw]], (args.batch, 1))
    patches = (rng.standard_normal(
        (args.batch * gh * gw, vcfg.patch_dim)) * 0.5).astype(np.float32)

    def run_generate(decoder, new):
        t_enc = time.perf_counter()
        vis, deep = encoder.encode(patches, grids.tolist())
        t_enc = time.perf_counter() - t_enc
        embeds = np.array(embed_tokens(tparams, ids), np.float32)
        slots = np.nonzero(ids == image_token)
        embeds[slots[0], slots[1]] = vis[:len(slots[0])]
        b, t, e = embeds.shape
        feats = []
        for d in deep:
            feat = np.zeros((b, t, e), np.float32)
            feat[slots[0], slots[1]] = d[:len(slots[0])]
            feats.append(feat)
        pos, next_pos = rope_index_batch(ids, valid, grids, image_token)
        t_dec = time.perf_counter()
        out = decoder.generate(embeds, valid, pos, next_pos,
                               np.asarray([0], np.int32),
                               vis_mask=ids == image_token, deep_feats=feats)
        t_dec = time.perf_counter() - t_dec
        assert out.shape == (args.batch, new)
        return t_enc, t_dec

    result = {"metric": "qwen3_vl_tagging_images_per_second_per_chip",
              "unit": "images/sec", "batch": args.batch,
              "grid": [gh, gw], "vision_tokens_per_image": cells,
              "prompt_tokens": int(bucket),
              "device": str(jax.devices()[0])}
    for new in (100, 32):
        decoder = Qwen3TextDecoder(tparams, tcfg, dtype=jnp.bfloat16,
                                   max_new_tokens=new)
        t_enc, t_dec = run_generate(decoder, new)      # compile + transfer
        phase(f"compiled max_new={new} (enc {t_enc:.1f}s dec {t_dec:.1f}s)")
        best = None
        for _ in range(args.repeats):
            t_enc, t_dec = run_generate(decoder, new)
            total = t_enc + t_dec
            if best is None or total < best[0]:
                best = (total, t_enc, t_dec)
        total, t_enc, t_dec = best
        key = f"max_new_{new}"
        result[key] = {
            "images_per_second": round(args.batch / total, 3),
            "encode_s": round(t_enc, 2), "decode_s": round(t_dec, 2),
            "decode_tokens_per_second":
                round(args.batch * new / t_dec, 1),
        }
        if new == 100:
            result["value"] = result[key]["images_per_second"]
        phase(f"measured max_new={new}: "
              f"{result[key]['images_per_second']} img/s")
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

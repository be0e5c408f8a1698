#!/usr/bin/env python3
"""Convert public model checkpoints into facet_tpu's .npz parameter format.

Run once on a machine with the source checkpoints downloaded; the outputs in
pretrained_models/ make every ensemble member produce real scores:

  clip_vit_l14_vision.npz  <- open_clip ViT-L-14/laion2b_s32b_b82k or the HF
                              CLIPVisionModelWithProjection state dict
  clip_vit_l14_text.npz    <- same checkpoint's text tower
  aesthetic_head.npz       <- improved-aesthetic-predictor linearMSE head
  samp_net.npz             <- CADB SAMP-Net release (samp_net.pth)
  u2netp.npz               <- U2-Net-P saliency weights (u2netp.pth)
  topiq.npz                <- pyiqa TOPIQ (cfanet) checkpoint
  scrfd/arcface/landmark   <- insightface buffalo_l ONNX (requires `onnx`)
  tag_embeddings.npz       <- prompt embeddings from the converted text tower

Usage:
  python tools/convert_checkpoints.py --source DIR [--out pretrained_models]

Each converter is independent; missing sources are skipped with a note.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_torch(path):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in blob.items()}


def convert_clip(source_dir, out_dir):
    from facet_tpu.models.convert import (
        convert_hf_clip_text,
        convert_hf_clip_vision,
        convert_openclip_vision,
        save_params,
    )

    for name in ("open_clip_pytorch_model.bin", "clip_vit_l14.pth",
                 "pytorch_model.bin"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        sd = _load_torch(path)
        if any(k.startswith("visual.") for k in sd):
            params = convert_openclip_vision(sd, layers=24)
        else:
            params = convert_hf_clip_vision(sd, layers=24)
        save_params(params, os.path.join(out_dir, "clip_vit_l14_vision.npz"))
        print("converted CLIP vision tower")
        if any(k.startswith("text_model.") for k in sd):
            save_params(convert_hf_clip_text(sd, layers=12),
                        os.path.join(out_dir, "clip_vit_l14_text.npz"))
            print("converted CLIP text tower")
        return True
    print("skip: no CLIP checkpoint found")
    return False


def convert_aesthetic(source_dir, out_dir):
    from facet_tpu.models.convert import convert_aesthetic_head, save_params

    path = os.path.join(source_dir, "sac+logos+ava1-l14-linearMSE.pth")
    if not os.path.exists(path):
        path = os.path.join(source_dir, "aesthetic_predictor_weights.pth")
    if not os.path.exists(path):
        print("skip: no aesthetic head checkpoint")
        return False
    sd = _load_torch(path)
    if "layers.0.weight" in sd:
        # the REAL improved-aesthetic-predictor MLP (the reference's own
        # download URL) — collapsed exactly into the fc1/relu/fc2 head
        # with normalize-input semantics (see convert_aesthetic_head)
        save_params(convert_aesthetic_head(sd),
                    os.path.join(out_dir, "aesthetic_head.npz"))
        print("converted aesthetic head (improved-aesthetic-predictor "
              "full MLP, collapsed exact; the reference silently fails "
              "to load this file — strict=False into a mismatched "
              "Sequential)")
        return True
    if "0.weight" in sd and sd["0.weight"].shape == (256, 768):
        save_params(convert_aesthetic_head(sd),
                    os.path.join(out_dir, "aesthetic_head.npz"))
        print("converted aesthetic head")
        return True
    print("note: aesthetic checkpoint layout matches neither "
          "improved-aesthetic-predictor (layers.*) nor the declared "
          "Linear(768,256,1); fit or export a matching head, then re-run")
    return False


def _bn(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"],
        "bias": sd[prefix + ".bias"],
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }


def _conv(sd, key):
    return sd[key].transpose(2, 3, 1, 0)  # (out,in,kh,kw) -> (kh,kw,in,out)


def convert_u2netp(source_dir, out_dir):
    """u2netp.pth -> our U2NETP flax tree (name-mapped)."""
    path = os.path.join(source_dir, "u2netp.pth")
    if not os.path.exists(path):
        print("skip: no u2netp.pth")
        return False
    sd = _load_torch(path)

    def rebn(tprefix):
        return {
            "Conv_0": {"kernel": _conv(sd, tprefix + ".conv_s1.weight"),
                       "bias": sd[tprefix + ".conv_s1.bias"]},
            "BatchNorm_0": _bn(sd, tprefix + ".bn_s1"),
        }

    def rsu(tprefix, depth):
        tree = {"convin": rebn(tprefix + ".rebnconvin")}
        for d in range(depth - 1):
            tree[f"enc{d}"] = rebn(f"{tprefix}.rebnconv{d + 1}")
        tree["bottom"] = rebn(f"{tprefix}.rebnconv{depth}")
        for d in range(depth - 1):
            tree[f"dec{d}"] = rebn(f"{tprefix}.rebnconv{d + 1}d")
        return tree

    def rsu4f(tprefix):
        tree = {"convin": rebn(tprefix + ".rebnconvin")}
        for i, name in enumerate(("enc0", "enc1", "enc2")):
            tree[name] = rebn(f"{tprefix}.rebnconv{i + 1}")
        tree["bottom"] = rebn(f"{tprefix}.rebnconv4")
        for i, name in enumerate(("dec2", "dec1", "dec0")):
            tree[name] = rebn(f"{tprefix}.rebnconv{3 - i}d")
        return tree

    params = {
        "stage1": rsu("stage1", 7), "stage2": rsu("stage2", 6),
        "stage3": rsu("stage3", 5), "stage4": rsu("stage4", 4),
        "stage5": rsu4f("stage5"), "stage6": rsu4f("stage6"),
        "stage5d": rsu4f("stage5d"), "stage4d": rsu("stage4d", 4),
        "stage3d": rsu("stage3d", 5), "stage2d": rsu("stage2d", 6),
        "stage1d": rsu("stage1d", 7),
    }
    for i in range(1, 7):
        params[f"side{i}"] = {"kernel": _conv(sd, f"side{i}.weight"),
                              "bias": sd[f"side{i}.bias"]}
    params["outconv"] = {"kernel": _conv(sd, "outconv.weight"),
                         "bias": sd["outconv.bias"]}

    from facet_tpu.models.convert import save_params

    # NOTE: flax BatchNorm stores stats in a separate 'batch_stats' collection;
    # our inference modules read use_running_average=True, so remap:
    tree = _split_bn_collections({"params": params})
    save_params(tree, os.path.join(out_dir, "u2netp.npz"))
    print("converted u2netp")
    return True


def _split_bn_collections(tree):
    """Move BatchNorm mean/var into the flax 'batch_stats' collection."""
    params, stats = {}, {}

    def walk(node, ppath, spath):
        for key, val in node.items():
            if isinstance(val, dict):
                if "mean" in val and "var" in val:
                    ppath[key] = {"scale": val["scale"], "bias": val["bias"]}
                    spath[key] = {"mean": val["mean"], "var": val["var"]}
                else:
                    ppath[key] = {}
                    spath[key] = {}
                    walk(val, ppath[key], spath[key])
                    if not spath[key]:
                        del spath[key]
            else:
                ppath[key] = val

    walk(tree["params"], params, stats)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def build_tag_embeddings(out_dir, config_path=None):
    """Encode the config vocabulary with the converted text tower."""
    text_path = os.path.join(out_dir, "clip_vit_l14_text.npz")
    if not os.path.exists(text_path):
        print("skip tag embeddings: convert the text tower first")
        return False
    try:
        from transformers import CLIPTokenizerFast

        tokenizer = CLIPTokenizerFast.from_pretrained("openai/clip-vit-large-patch14")
    except Exception as exc:
        print(f"skip tag embeddings: no CLIP tokenizer assets ({exc})")
        return False

    import jax.numpy as jnp

    from facet_tpu.config.scoring_config import ScoringConfig
    from facet_tpu.models.clip import CLIPTextTower
    from facet_tpu.models.convert import load_params
    from facet_tpu.models.tagger import CLIPTagger

    config = ScoringConfig(config_path)
    tagger = CLIPTagger(config)
    params = load_params(text_path)
    tower = CLIPTextTower(dtype=jnp.float32)
    ids = tokenizer(tagger.prompts, padding="max_length", max_length=77,
                    return_tensors="np").input_ids.astype(np.int32)
    emb = np.asarray(tower.apply(params, jnp.asarray(ids)))
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    np.savez_compressed(os.path.join(out_dir, "tag_embeddings.npz"),
                        prompts=np.array(tagger.prompts), embeddings=emb)
    print(f"built tag embeddings for {len(tagger.prompts)} prompts")
    return True


def convert_samp(source_dir, out_dir):
    path = os.path.join(source_dir, "samp_net.pth")
    if not os.path.exists(path):
        print("skip: no samp_net.pth")
        return False
    from facet_tpu.models.convert import convert_samp_net, save_params

    save_params(convert_samp_net(_load_torch(path)),
                os.path.join(out_dir, "samp_net.npz"))
    print("converted samp_net")
    return True


def convert_arcface(source_dir, out_dir):
    """arcface_torch iresnet50 backbone checkpoint -> arcface_iresnet50.npz.

    Accepts the published arcface_torch backbone files (glint360k_r50.pth /
    ms1mv3_arcface_r50.pth / backbone.pth) — the same network buffalo_l's
    w600k_r50.onnx is exported from. Key map verified by
    tests/test_convert_arcface.py (strict torch load + numeric parity).
    """
    from facet_tpu.models.convert import convert_arcface_iresnet50, save_params

    for name in ("w600k_r50.pth", "glint360k_r50.pth",
                 "ms1mv3_arcface_r50.pth", "backbone.pth"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        sd = _load_torch(path)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        save_params(convert_arcface_iresnet50(sd),
                    os.path.join(out_dir, "arcface_iresnet50.npz"))
        print(f"converted arcface iresnet50 from {name}")
        return True
    print("skip: no arcface backbone checkpoint"
          " (w600k_r50.pth / glint360k_r50.pth / backbone.pth)")
    return False


def convert_topiq_ckpt(source_dir, out_dir):
    """pyiqa TOPIQ checkpoint -> topiq.npz (backbone exact; head layout per
    docs/CONVERTERS.md — unmapped/missing keys are reported so a run against
    the real checkpoint immediately shows any naming drift)."""
    for name in ("cfanet_nr_koniq_res50.pth", "topiq_nr.pth", "topiq.pth"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import (
            convert_topiq,
            merge_into_init,
            save_params,
        )
        from facet_tpu.models.topiq import TOPIQConfig, TOPIQNet

        sd = _load_torch(path)
        tree, unmapped = convert_topiq(sd)
        net = TOPIQNet(TOPIQConfig())
        init = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
        merged, missing, extra = merge_into_init(init, tree)
        save_params(merged, os.path.join(out_dir, "topiq.npz"))
        print(f"converted topiq from {name}")
        if unmapped:
            print(f"  WARNING {len(unmapped)} source keys unmapped (head "
                  f"naming drift?): {unmapped[:8]}...")
        if missing:
            print(f"  note: {len(missing)} module params kept at init: "
                  f"{missing[:6]}")
        if extra:
            print(f"  WARNING converted paths not in module: {extra[:6]}")
        return True
    print("skip: no TOPIQ checkpoint (cfanet_nr_koniq_res50.pth)")
    return False


def convert_qwen_vision_ckpt(source_dir, out_dir):
    """Qwen2.5-VL checkpoint dir -> qwen25_vision.npz (vision tower only;
    the LLM stays a host transformers model — hybrid wiring in
    models/vlm_tagger.py swaps the visual tower for the flax one)."""
    candidates = [d for d in (source_dir, os.path.join(source_dir, "qwen2.5-vl"))
                  if os.path.isdir(d)]
    for base in candidates:
        files = [f for f in sorted(os.listdir(base))
                 if f.endswith((".safetensors", ".bin"))
                 and "index" not in f]
        visual_sd = {}
        for name in files:
            path = os.path.join(base, name)
            try:
                if name.endswith(".safetensors"):
                    from safetensors import safe_open

                    with safe_open(path, framework="np") as fh:
                        for key in fh.keys():
                            if key.startswith(("visual.", "model.visual.")):
                                visual_sd[key.removeprefix("model.")] = \
                                    fh.get_tensor(key)
                else:
                    sd = _load_torch(path)
                    visual_sd.update(
                        {k.removeprefix("model."): v for k, v in sd.items()
                         if k.startswith(("visual.", "model.visual."))})
            except Exception as exc:
                print(f"  skip {name}: {exc}")
        if visual_sd:
            import numpy as np_

            from facet_tpu.models.convert import save_params
            from facet_tpu.models.qwen_vision import convert_qwen_vision

            visual_sd = {k: np_.asarray(v, np_.float32)
                         for k, v in visual_sd.items()}
            save_params(convert_qwen_vision(visual_sd),
                        os.path.join(out_dir, "qwen25_vision.npz"))
            print(f"converted qwen2.5-vl vision tower"
                  f" ({len(visual_sd)} tensors)")
            return True
    print("skip: no Qwen2.5-VL checkpoint directory")
    return False


def convert_qwen_text_ckpt(source_dir, out_dir):
    """Qwen2.5-VL checkpoint dir -> qwen25_text.npz (language model +
    lm_head). With qwen25_vision.npz this enables the all-TPU tagging path
    (models/vlm_tagger.py _load_device_path)."""
    candidates = [d for d in (source_dir, os.path.join(source_dir, "qwen2.5-vl"))
                  if os.path.isdir(d)]
    wanted = ("model.language_model.", "language_model.", "model.layers.",
              "model.embed_tokens.", "model.norm.", "lm_head.")
    for base in candidates:
        files = [f for f in sorted(os.listdir(base))
                 if f.endswith((".safetensors", ".bin"))
                 and "index" not in f]
        text_sd = {}
        for name in files:
            path = os.path.join(base, name)
            try:
                if name.endswith(".safetensors"):
                    from safetensors import safe_open

                    with safe_open(path, framework="np") as fh:
                        for key in fh.keys():
                            if key.startswith(wanted):
                                text_sd[key] = fh.get_tensor(key)
                else:
                    sd = _load_torch(path)
                    text_sd.update({k: v for k, v in sd.items()
                                    if k.startswith(wanted)})
            except Exception as exc:
                print(f"  skip {name}: {exc}")
        if text_sd:
            from facet_tpu.models.convert import save_params
            from facet_tpu.models.qwen_text import (
                QwenTextConfig,
                convert_qwen_text,
            )

            cfg = QwenTextConfig(
                tie_word_embeddings="lm_head.weight" not in text_sd)
            save_params(convert_qwen_text(text_sd, cfg),
                        os.path.join(out_dir, "qwen25_text.npz"))
            print(f"converted qwen2.5-vl text decoder"
                  f" ({len(text_sd)} tensors, tied={cfg.tie_word_embeddings})")
            return True
    print("skip: no Qwen2.5-VL checkpoint directory (text)")
    return False


def convert_qwen3_ckpt(source_dir, out_dir):
    """Qwen3-VL checkpoint dir -> qwen3_vision.npz + qwen3_text.npz.
    Together they enable the all-TPU qwen3_vl_tagger path (DeepStack
    features flow vision -> early decoder layers, models/qwen3_text.py)."""
    candidates = [d for d in (source_dir, os.path.join(source_dir, "qwen3-vl"))
                  if os.path.isdir(d)]
    v_want = ("visual.", "model.visual.")
    t_want = ("model.language_model.", "language_model.", "model.layers.",
              "model.embed_tokens.", "model.norm.", "lm_head.")
    for base in candidates:
        files = [f for f in sorted(os.listdir(base))
                 if f.endswith((".safetensors", ".bin")) and "index" not in f]
        vis_sd, text_sd = {}, {}
        for name in files:
            path = os.path.join(base, name)
            try:
                if name.endswith(".safetensors"):
                    from safetensors import safe_open

                    with safe_open(path, framework="np") as fh:
                        for key in fh.keys():
                            if key.startswith(v_want):
                                vis_sd[key.removeprefix("model.")] = \
                                    fh.get_tensor(key)
                            elif key.startswith(t_want):
                                text_sd[key] = fh.get_tensor(key)
                else:
                    sd = _load_torch(path)
                    vis_sd.update({k.removeprefix("model."): v
                                   for k, v in sd.items()
                                   if k.startswith(v_want)})
                    text_sd.update({k: v for k, v in sd.items()
                                    if k.startswith(t_want)})
            except Exception as exc:
                print(f"  skip {name}: {exc}")
        if vis_sd and text_sd:
            from facet_tpu.models.convert import save_params
            from facet_tpu.models.qwen3_text import (
                Qwen3TextConfig,
                convert_qwen3_text,
            )
            from facet_tpu.models.qwen3_vision import convert_qwen3_vision

            save_params(convert_qwen3_vision(vis_sd),
                        os.path.join(out_dir, "qwen3_vision.npz"))
            cfg = Qwen3TextConfig(
                tie_word_embeddings="lm_head.weight" not in text_sd)
            save_params(convert_qwen3_text(text_sd, cfg),
                        os.path.join(out_dir, "qwen3_text.npz"))
            print(f"converted qwen3-vl vision ({len(vis_sd)} tensors) +"
                  f" text ({len(text_sd)} tensors,"
                  f" tied={cfg.tie_word_embeddings})")
            return True
    print("skip: no Qwen3-VL checkpoint directory")
    return False


def convert_ram_plus_ckpt(source_dir, out_dir):
    """recognize-anything ram_plus_swin_large_14m.pth -> ram_plus.npz.

    The tag list / per-class thresholds ship as text files alongside the
    published checkpoint (ram_tag_list.txt, ram_tag_list_threshold.txt);
    they are copied next to the npz so models/ram_tagger.py finds them.
    """
    for name in ("ram_plus_swin_large_14m.pth", "ram_plus.pth"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        from facet_tpu.models.convert import convert_ram_plus, save_params

        sd = _load_torch(path)
        tree, unmapped = convert_ram_plus(sd)
        save_params(tree, os.path.join(out_dir, "ram_plus.npz"))
        print(f"converted ram_plus from {name}")
        if unmapped:
            print(f"  WARNING {len(unmapped)} source keys unmapped: "
                  f"{unmapped[:8]}...")
        for aux in ("ram_tag_list.txt", "ram_tag_list_threshold.txt"):
            p = os.path.join(source_dir, aux)
            if os.path.exists(p):
                import shutil

                shutil.copy(p, os.path.join(out_dir, aux))
                print(f"  copied {aux}")
        return True
    print("skip: no ram_plus checkpoint (ram_plus_swin_large_14m.pth)")
    return False


def convert_hyperiqa_ckpt(source_dir, out_dir):
    """Official/pyiqa HyperIQA checkpoint (koniq_pretrained.pkl /
    hyperiqa.pth — the HyperNet state dict) -> hyperiqa.npz."""
    for name in ("hyperiqa.pth", "koniq_pretrained.pkl", "hyperiqa.pkl"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        from facet_tpu.models.convert import convert_hyperiqa, save_params

        tree, unmapped = convert_hyperiqa(_load_torch(path))
        save_params(tree, os.path.join(out_dir, "hyperiqa.npz"))
        print(f"converted hyperiqa from {name}")
        if unmapped:
            print(f"  WARNING {len(unmapped)} source keys unmapped: "
                  f"{unmapped[:8]}...")
        return True
    print("skip: no hyperiqa checkpoint (hyperiqa.pth)")
    return False


def convert_dbcnn_ckpt(source_dir, out_dir):
    """pyiqa DBCNN checkpoint (DBCNN.pth / dbcnn.pth: features1 VGG-16 +
    features2 S-CNN + fc bilinear head) -> dbcnn.npz."""
    for name in ("DBCNN.pth", "dbcnn.pth", "DBCNN_KonIQ.pth"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        from facet_tpu.models.convert import convert_dbcnn, save_params

        tree, unmapped = convert_dbcnn(_load_torch(path))
        save_params(tree, os.path.join(out_dir, "dbcnn.npz"))
        print(f"converted dbcnn from {name}")
        if unmapped:
            print(f"  WARNING {len(unmapped)} source keys unmapped: "
                  f"{unmapped[:8]}...")
        return True
    print("skip: no dbcnn checkpoint (DBCNN.pth)")
    return False


def convert_musiq_ckpt(source_dir, out_dir):
    """pyiqa MUSIQ checkpoint (musiq_koniq_ckpt.pth: per-patch conv root +
    multi-scale hash-embedded transformer) -> musiq.npz."""
    for name in ("musiq_koniq_ckpt.pth", "musiq.pth",
                 "musiq_koniq_ckpt-e95806b9.pth"):
        path = os.path.join(source_dir, name)
        if not os.path.exists(path):
            continue
        from facet_tpu.models.convert import convert_musiq, save_params

        tree, unmapped = convert_musiq(_load_torch(path))
        save_params(tree, os.path.join(out_dir, "musiq.npz"))
        print(f"converted musiq from {name}")
        if unmapped:
            print(f"  WARNING {len(unmapped)} source keys unmapped: "
                  f"{unmapped[:8]}...")
        return True
    print("skip: no musiq checkpoint (musiq_koniq_ckpt.pth)")
    return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", default="checkpoints",
                        help="directory with downloaded source checkpoints")
    parser.add_argument("--out", default="pretrained_models")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    convert_clip(args.source, args.out)
    convert_aesthetic(args.source, args.out)
    convert_u2netp(args.source, args.out)
    convert_samp(args.source, args.out)
    convert_arcface(args.source, args.out)
    convert_topiq_ckpt(args.source, args.out)
    convert_hyperiqa_ckpt(args.source, args.out)
    convert_dbcnn_ckpt(args.source, args.out)
    convert_musiq_ckpt(args.source, args.out)
    convert_ram_plus_ckpt(args.source, args.out)
    convert_qwen_vision_ckpt(args.source, args.out)
    convert_qwen_text_ckpt(args.source, args.out)
    convert_qwen3_ckpt(os.path.join(args.source, 'qwen3-vl') if os.path.isdir(os.path.join(args.source, 'qwen3-vl')) else args.source, args.out)
    build_tag_embeddings(args.out)
    print("done; for SCRFD/landmark (ONNX-only) run tools/convert_insightface.py"
          " — key maps and verification status in docs/CONVERTERS.md")


if __name__ == "__main__":
    main()

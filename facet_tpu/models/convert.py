"""Checkpoint converters: public torch CLIP checkpoints -> our flax params.

Supports both naming schemes in the wild:
- Hugging Face CLIPVisionModel(WithProjection)/CLIPTextModel(WithProjection)
  state dicts ("vision_model.encoder.layers.N...."),
- open_clip / OpenAI state dicts ("visual.transformer.resblocks.N...." with
  packed qkv in_proj).

Everything returns plain numpy pytrees matching CLIPVisionTower /
CLIPTextTower parameter structure; save/load via .npz keeps orbax optional.
"""

import numpy as np


def _ln(weight, bias):
    return {"scale": np.asarray(weight, np.float32), "bias": np.asarray(bias, np.float32)}


def _dense(weight, bias=None):
    out = {"kernel": np.asarray(weight, np.float32).T}
    if bias is not None:
        out["bias"] = np.asarray(bias, np.float32)
    return out


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_clip_vision(state_dict, layers=24):
    """HF CLIPVisionModelWithProjection state_dict -> flax params dict."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    pfx = "vision_model."
    params = {
        "class_embedding": sd[pfx + "embeddings.class_embedding"].reshape(-1),
        "position_embedding": sd[pfx + "embeddings.position_embedding.weight"],
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": sd[pfx + "embeddings.patch_embedding.weight"]
            .transpose(2, 3, 1, 0).astype(np.float32)
        },
        "ln_pre": _ln(sd[pfx + "pre_layrnorm.weight"], sd[pfx + "pre_layrnorm.bias"]),
        "ln_post": _ln(sd[pfx + "post_layernorm.weight"], sd[pfx + "post_layernorm.bias"]),
        "projection": sd["visual_projection.weight"].T.astype(np.float32),
    }
    for i in range(layers):
        lp = f"{pfx}encoder.layers.{i}."
        params[f"block_{i}"] = {
            "ln1": _ln(sd[lp + "layer_norm1.weight"], sd[lp + "layer_norm1.bias"]),
            "ln2": _ln(sd[lp + "layer_norm2.weight"], sd[lp + "layer_norm2.bias"]),
            "attn": {
                name: _dense(sd[lp + f"self_attn.{name}.weight"],
                             sd[lp + f"self_attn.{name}.bias"])
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "mlp": {
                "fc1": _dense(sd[lp + "mlp.fc1.weight"], sd[lp + "mlp.fc1.bias"]),
                "fc2": _dense(sd[lp + "mlp.fc2.weight"], sd[lp + "mlp.fc2.bias"]),
            },
        }
    return {"params": params}


def convert_hf_clip_text(state_dict, layers=12):
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    pfx = "text_model."
    params = {
        "token_embedding": sd[pfx + "embeddings.token_embedding.weight"].astype(np.float32),
        "position_embedding": sd[pfx + "embeddings.position_embedding.weight"].astype(np.float32),
        "ln_final": _ln(sd[pfx + "final_layer_norm.weight"],
                        sd[pfx + "final_layer_norm.bias"]),
        "projection": sd["text_projection.weight"].T.astype(np.float32),
    }
    for i in range(layers):
        lp = f"{pfx}encoder.layers.{i}."
        params[f"block_{i}"] = {
            "ln1": _ln(sd[lp + "layer_norm1.weight"], sd[lp + "layer_norm1.bias"]),
            "ln2": _ln(sd[lp + "layer_norm2.weight"], sd[lp + "layer_norm2.bias"]),
            "attn": {
                name: _dense(sd[lp + f"self_attn.{name}.weight"],
                             sd[lp + f"self_attn.{name}.bias"])
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "mlp": {
                "fc1": _dense(sd[lp + "mlp.fc1.weight"], sd[lp + "mlp.fc1.bias"]),
                "fc2": _dense(sd[lp + "mlp.fc2.weight"], sd[lp + "mlp.fc2.bias"]),
            },
        }
    return {"params": params}


def convert_openclip_vision(state_dict, layers=24):
    """open_clip / OpenAI 'visual.*' state_dict (packed qkv) -> flax params."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items() if k.startswith("visual.")}
    params = {
        "class_embedding": sd["visual.class_embedding"].reshape(-1),
        "position_embedding": sd["visual.positional_embedding"],
        "patch_embed": {
            "kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0).astype(np.float32)
        },
        "ln_pre": _ln(sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"]),
        "ln_post": _ln(sd["visual.ln_post.weight"], sd["visual.ln_post.bias"]),
        "projection": sd["visual.proj"].astype(np.float32),
    }
    for i in range(layers):
        lp = f"visual.transformer.resblocks.{i}."
        w = sd[lp + "attn.in_proj_weight"]
        b = sd[lp + "attn.in_proj_bias"]
        d = w.shape[0] // 3
        qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
        qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
        params[f"block_{i}"] = {
            "ln1": _ln(sd[lp + "ln_1.weight"], sd[lp + "ln_1.bias"]),
            "ln2": _ln(sd[lp + "ln_2.weight"], sd[lp + "ln_2.bias"]),
            "attn": {
                "q_proj": _dense(qw, qb),
                "k_proj": _dense(kw, kb),
                "v_proj": _dense(vw, vb),
                "out_proj": _dense(sd[lp + "attn.out_proj.weight"],
                                   sd[lp + "attn.out_proj.bias"]),
            },
            "mlp": {
                "fc1": _dense(sd[lp + "mlp.c_fc.weight"], sd[lp + "mlp.c_fc.bias"]),
                "fc2": _dense(sd[lp + "mlp.c_proj.weight"], sd[lp + "mlp.c_proj.bias"]),
            },
        }
    return {"params": params}


def convert_aesthetic_head(state_dict):
    """torch Sequential(Linear(768,256), ReLU, Linear(256,1)) -> flax params."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    return {"params": {
        "fc1": _dense(sd["0.weight"], sd["0.bias"]),
        "fc2": _dense(sd["2.weight"], sd["2.bias"]),
    }}


# --------------------------------------------------------------- ResNet/SAMP


def _conv_t(weight):
    """torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.asarray(weight, np.float32).transpose(2, 3, 1, 0)


def _bn_t(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
         "bias": np.asarray(sd[prefix + ".bias"], np.float32)},
        {"mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
         "var": np.asarray(sd[prefix + ".running_var"], np.float32)},
    )


def convert_torchvision_resnet18(sd, prefix=""):
    """torchvision resnet18 (children[:-2]) -> our ResNet18Features trees.

    Returns (params, batch_stats). `prefix` handles wrapped checkpoints
    (e.g. SAMP-Net's 'backbone.' Sequential naming: backbone.0=conv1,
    backbone.1=bn1, backbone.4..7=layer1..4).
    """
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    seq = any(k.startswith(prefix + "0.") for k in sd)

    def key(torch_name):
        if not seq:
            return prefix + torch_name
        head_map = {"conv1": "0", "bn1": "1"}
        part = torch_name.split(".")[0]
        if part in head_map:
            return prefix + torch_name.replace(part, head_map[part], 1)
        # layer1..layer4 -> indices 4..7
        layer_idx = int(part[5]) + 3
        return prefix + torch_name.replace(part, str(layer_idx), 1)

    params, stats = {}, {}
    params["Conv_0"] = {"kernel": _conv_t(sd[key("conv1.weight")])}
    p, s = _bn_t(sd, key("bn1"))
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s

    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tp = key(f"layer{stage}.{block}")
            bp, bs = {}, {}
            for ci, cname in ((1, "Conv_0"), (2, "Conv_1")):
                bp[cname] = {"kernel": _conv_t(sd[f"{tp}.conv{ci}.weight"])}
                pn, sn = _bn_t(sd, f"{tp}.bn{ci}")
                bname = f"BatchNorm_{ci - 1}"
                bp[bname], bs[bname] = pn, sn
            if f"{tp}.downsample.0.weight" in sd:
                bp["down_conv"] = {"kernel": _conv_t(sd[f"{tp}.downsample.0.weight"])}
                pn, sn = _bn_t(sd, f"{tp}.downsample.1")
                bp["down_bn"], bs["down_bn"] = pn, sn
            params[name], stats[name] = bp, bs
    return params, stats


def convert_samp_net(state_dict):
    """CADB SAMP-Net checkpoint -> our SAMPNet flax tree.

    Maps the backbone (Sequential resnet18 children), the 8 pattern convs
    (conv_list.N.0), the pattern-weight layer and the three heads.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    backbone_p, backbone_s = convert_torchvision_resnet18(sd, prefix="backbone.")
    params = {"backbone": backbone_p}
    stats = {"backbone": backbone_s}

    for i in range(8):
        params[f"pattern_conv{i}"] = {
            "kernel": _conv_t(sd[f"pattern_module.conv_list.{i}.0.weight"])}
    params["pattern_weight"] = {
        "kernel": np.asarray(sd["pattern_weight_layer.3.weight"], np.float32).T}
    params["att_feature"] = {
        "kernel": np.asarray(sd["att_feature_layer.0.weight"], np.float32).T}
    params["att_pred"] = {
        "kernel": np.asarray(sd["att_pred_layer.0.weight"], np.float32).T}
    params["com_pred0"] = {
        "kernel": np.asarray(sd["com_pred_layer.0.weight"], np.float32).T}
    params["com_pred3"] = {
        "kernel": np.asarray(sd["com_pred_layer.3.weight"], np.float32).T}
    params["com_pred5"] = {
        "kernel": np.asarray(sd["com_pred_layer.5.weight"], np.float32).T}
    return {"params": params, "batch_stats": stats}


def convert_torchvision_resnet50(sd, prefix=""):
    """torchvision resnet50 -> our ResNet50Stages trees (TOPIQ + HyperIQA
    backbones). Returns (params, batch_stats)."""
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    params, stats = {}, {}
    params["Conv_0"] = {"kernel": _conv_t(sd[prefix + "conv1.weight"])}
    p, s = _bn_t(sd, prefix + "bn1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s

    blocks_per_stage = (3, 4, 6, 3)
    for stage, blocks in enumerate(blocks_per_stage, start=1):
        for block in range(blocks):
            name = f"layer{stage}_{block}"
            tp = f"{prefix}layer{stage}.{block}"
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp[f"Conv_{ci - 1}"] = {"kernel": _conv_t(sd[f"{tp}.conv{ci}.weight"])}
                pn, sn = _bn_t(sd, f"{tp}.bn{ci}")
                bp[f"BatchNorm_{ci - 1}"], bs[f"BatchNorm_{ci - 1}"] = pn, sn
            if f"{tp}.downsample.0.weight" in sd:
                bp["down_conv"] = {"kernel": _conv_t(sd[f"{tp}.downsample.0.weight"])}
                pn, sn = _bn_t(sd, f"{tp}.downsample.1")
                bp["down_bn"], bs["down_bn"] = pn, sn
            params[name], stats[name] = bp, bs
    return params, stats


# ------------------------------------------------------------ npz save/load

def flatten_tree(tree, prefix=""):
    flat = {}
    for key, val in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            flat.update(flatten_tree(val, path))
        else:
            flat[path] = np.asarray(val)
    return flat


def unflatten_tree(flat):
    tree = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree


def save_params(params, path):
    np.savez_compressed(path, **flatten_tree(params))


def load_params(path):
    data = np.load(path)
    return unflatten_tree({k: data[k] for k in data.files})

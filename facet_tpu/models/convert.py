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


def convert_aesthetic_head(state_dict, hidden=256):
    """Aesthetic-head checkpoint -> flax AestheticHead params.

    Two published vocabularies:

    - ``0.weight``/``2.weight`` — the Sequential(Linear(768,256), ReLU,
      Linear(256,1)) layout the reference DECLARES
      (processing/scorer.py:579-585): a direct map.
    - ``layers.{0,2,4,6,7}.weight`` — the REAL
      improved-aesthetic-predictor MLP the reference's code actually
      downloads (sac+logos+ava1-l14-linearMSE.pth: Linear(768,1024) ->
      Dropout -> Linear(1024,128) -> Dropout -> Linear(128,64) ->
      Dropout -> Linear(64,16) -> Linear(16,1), NO activations). The
      reference loads it with strict=False into the mismatched
      Sequential, so none of its weights ever take effect and its
      aesthetic head silently stays random-init. Here the stack — purely
      affine at inference (Dropout is identity) — is composed in float64
      into one (1, 768) map and expressed EXACTLY in the fc1/relu/fc2
      structure via relu(z) - relu(-z) = z. The published head scores
      L2-NORMALIZED embeddings on a raw 0-10 scale, while the engine's
      fused formula is ``clip((head(f_unnorm) + 1) * 5)``; the returned
      tree carries ``meta/normalize_input`` (AestheticHead normalizes
      inside the module) and the composed map is rescaled by (/5, -1) so
      the engine's unchanged outer formula reproduces the predictor's
      own 0-10 score.

    Returns the flax variables tree (with the extra ``meta`` collection
    only for the real vocabulary).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    if "layers.0.weight" in sd:
        idxs = sorted(int(k.split(".")[1]) for k in sd
                      if k.startswith("layers.") and k.endswith(".weight"))
        w, b = None, None
        for i in idxs:
            wi = np.asarray(sd[f"layers.{i}.weight"], np.float64)
            bi = np.asarray(sd[f"layers.{i}.bias"], np.float64)
            w = wi if w is None else wi @ w
            b = bi if b is None else wi @ b + bi
        w, b = w / 5.0, b / 5.0 - 1.0          # fold the (raw+1)*5 formula
        fc1_k = np.zeros((w.shape[1], hidden), np.float32)
        fc1_k[:, 0], fc1_k[:, 1] = w[0], -w[0]
        fc1_b = np.zeros(hidden, np.float32)
        fc1_b[0], fc1_b[1] = b[0], -b[0]
        fc2_k = np.zeros((hidden, 1), np.float32)
        fc2_k[0, 0], fc2_k[1, 0] = 1.0, -1.0
        return {"params": {
            "fc1": {"kernel": fc1_k, "bias": fc1_b},
            "fc2": {"kernel": fc2_k, "bias": np.zeros(1, np.float32)},
        }, "meta": {"normalize_input": np.ones((), np.float32)}}
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


# -------------------------------------------------------------------- TOPIQ


def convert_topiq(state_dict, width=256, heads=4):
    """pyiqa TOPIQ (cfanet_nr_koniq_res50) checkpoint -> our TOPIQNet tree.

    The backbone maps exactly: pyiqa's `semantic_model` is a timm resnet50
    (same state-dict vocabulary as torchvision's), verified by
    tests/test_convert_resnet50.py. Head keys are mapped from the layout
    transcribed in docs/CONVERTERS.md; any source key this map does not
    consume is reported so a one-time run against the real checkpoint
    surfaces naming drift immediately.

    Returns (tree, unmapped_keys).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    consumed = set()

    backbone_sd = {}
    for key in sd:
        if key.startswith("semantic_model."):
            backbone_sd[key[len("semantic_model."):]] = sd[key]
            consumed.add(key)
    bp, bs = convert_torchvision_resnet50(backbone_sd)
    params = {"backbone": bp}
    stats = {"backbone": bs}

    def take(key):
        consumed.add(key)
        return sd[key]

    def dense(prefix):
        return {"kernel": np.asarray(take(prefix + ".weight"), np.float32).T,
                "bias": np.asarray(take(prefix + ".bias"), np.float32)}

    def layernorm(prefix):
        return {"scale": np.asarray(take(prefix + ".weight"), np.float32),
                "bias": np.asarray(take(prefix + ".bias"), np.float32)}

    def mha(prefix):
        """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
        in_w = np.asarray(take(prefix + ".in_proj_weight"), np.float32)
        in_b = np.asarray(take(prefix + ".in_proj_bias"), np.float32)
        out_w = np.asarray(take(prefix + ".out_proj.weight"), np.float32)
        out_b = np.asarray(take(prefix + ".out_proj.bias"), np.float32)
        dim = in_w.shape[1]
        head_dim = dim // heads
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        proj = lambda w: w.T.reshape(dim, heads, head_dim)
        return {
            "query": {"kernel": proj(qw), "bias": qb.reshape(heads, head_dim)},
            "key": {"kernel": proj(kw), "bias": kb.reshape(heads, head_dim)},
            "value": {"kernel": proj(vw), "bias": vb.reshape(heads, head_dim)},
            "out": {"kernel": out_w.T.reshape(heads, head_dim, dim),
                    "bias": out_b},
        }

    n_scales = 0
    while f"dim_reduce.{n_scales}.0.weight" in sd:
        n_scales += 1
    for i in range(n_scales):
        params[f"proj{i}"] = {
            "kernel": _conv_t(take(f"dim_reduce.{i}.0.weight")),
            "bias": np.asarray(take(f"dim_reduce.{i}.0.bias"), np.float32)}

    def attn_block(prefix):
        """One (self|cross) attention block in the transcribed layout:
        norm1/attn/norm2/linear1/linear2 (pre-LN, GELU MLP)."""
        block = {}
        if f"{prefix}.norm1.weight" in sd:
            block["LayerNorm_0"] = layernorm(f"{prefix}.norm1")
        if f"{prefix}.norm2.weight" in sd:
            block["LayerNorm_1"] = layernorm(f"{prefix}.norm2")
        if f"{prefix}.norm3.weight" in sd:
            block["LayerNorm_2"] = layernorm(f"{prefix}.norm3")
        if f"{prefix}.attn.in_proj_weight" in sd:
            block["cross"] = mha(f"{prefix}.attn")
        elif f"{prefix}.self_attn.in_proj_weight" in sd:
            block["cross"] = mha(f"{prefix}.self_attn")
        if f"{prefix}.linear1.weight" in sd:
            block["Dense_0"] = dense(f"{prefix}.linear1")
            block["Dense_1"] = dense(f"{prefix}.linear2")
        return block

    if "sa_attn_blks.0.norm1.weight" in sd \
            or "sa_attn_blks.0.self_attn.in_proj_weight" in sd:
        params["self_top"] = attn_block("sa_attn_blks.0")
    for level in range(max(0, n_scales - 1)):
        prefix = f"attn_blks.{level}"
        if f"{prefix}.attn.in_proj_weight" in sd \
                or f"{prefix}.norm1.weight" in sd:
            params[f"cross{level}"] = attn_block(prefix)

    if "attn_pool.weight" in sd:
        params["pool_gate"] = dense("attn_pool")
    if "score_linear.0.weight" in sd:
        params["head_norm"] = layernorm("score_linear.0")
        params["head0"] = dense("score_linear.1")
        params["head1"] = dense(f"score_linear.{_last_linear(sd)}")

    unmapped = sorted(k for k in sd if k not in consumed
                      and not k.endswith("num_batches_tracked"))
    return {"params": params, "batch_stats": stats}, unmapped


def _last_linear(sd):
    """Index of the final Linear inside pyiqa's score_linear Sequential."""
    idx = 1
    for i in range(2, 12):
        if f"score_linear.{i}.weight" in sd \
                and sd[f"score_linear.{i}.weight"].ndim == 2:
            idx = i
    return idx


def synthetic_resnet50_state_dict(rng=None, prefix=""):
    """torchvision/timm resnet50 key names + shapes (no egress needed)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k):
        scale = 1.0 / np.sqrt(cin * k * k)
        sd[prefix + name + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * scale

    def bn(name, c):
        sd[prefix + name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[prefix + name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[prefix + name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (feats, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1):
        for i in range(blocks):
            tp = f"layer{stage}.{i}"
            conv(f"{tp}.conv1", feats, cin, 1)
            bn(f"{tp}.bn1", feats)
            conv(f"{tp}.conv2", feats, feats, 3)
            bn(f"{tp}.bn2", feats)
            conv(f"{tp}.conv3", feats * 4, feats, 1)
            bn(f"{tp}.bn3", feats * 4)
            if i == 0:  # torchvision: first block of every stage downsamples
                conv(f"{tp}.downsample.0", feats * 4, cin, 1)
                bn(f"{tp}.downsample.1", feats * 4)
            cin = feats * 4
    return sd


def synthetic_topiq_state_dict(rng=None, width=256, heads=4):
    """A state dict in the transcribed pyiqa CFANet layout (see
    docs/CONVERTERS.md for the per-key provenance and verification status).
    Backbone keys are exact timm resnet50 names under `semantic_model.`."""
    rng = rng or np.random.default_rng(0)
    sd = synthetic_resnet50_state_dict(rng, prefix="semantic_model.")

    def linear(name, cout, cin):
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin)).astype(np.float32) / np.sqrt(cin)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    def ln(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)

    def attn(prefix):
        sd[prefix + ".in_proj_weight"] = rng.standard_normal(
            (3 * width, width)).astype(np.float32) / np.sqrt(width)
        sd[prefix + ".in_proj_bias"] = np.zeros(3 * width, np.float32)
        linear(prefix + ".out_proj", width, width)

    for i, dim in enumerate((256, 512, 1024, 2048)):
        sd[f"dim_reduce.{i}.0.weight"] = rng.standard_normal(
            (width, dim, 1, 1)).astype(np.float32) / np.sqrt(dim)
        sd[f"dim_reduce.{i}.0.bias"] = np.zeros(width, np.float32)

    def block(prefix, self_attn=False):
        ln(prefix + ".norm1", width)
        ln(prefix + ".norm2", width)
        ln(prefix + ".norm3", width)
        attn(prefix + (".self_attn" if self_attn else ".attn"))
        linear(prefix + ".linear1", width * 2, width)
        linear(prefix + ".linear2", width, width * 2)

    block("sa_attn_blks.0", self_attn=True)
    for level in range(3):
        block(f"attn_blks.{level}")

    linear("attn_pool", 1, width)
    ln("score_linear.0", width)
    linear("score_linear.1", width, width)
    linear("score_linear.3", 1, width)
    return sd


# ------------------------------------------------------------------ ArcFace

IRESNET50_LAYERS = (3, 4, 14, 3)


def convert_arcface_iresnet50(state_dict):
    """arcface_torch iresnet50 state dict -> our IResNet flax tree.

    Verified key map against the published backbone
    (insightface/recognition/arcface_torch/backbones/iresnet.py, the source
    of buffalo_l's w600k_r50.onnx export):

      conv1.weight / bn1.* / prelu.weight          -> conv1 / bn1 / prelu
      layer{s}.{i}.{bn1,conv1,bn2,prelu,conv2,bn3} -> layer{s}_{i}.*
      layer{s}.{i}.downsample.{0,1}                -> layer{s}_{i}.down_{conv,bn}
      bn2.* / fc.* / features.*                    -> bn2 / fc / features

    fc.weight is (512, 512*7*7) over a channel-first flatten; our module
    transposes to channel-first before flattening so the kernel maps as a
    plain transpose. features is a BatchNorm1d (affine + running stats).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv_t(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn_t(sd, "bn1")
    params["prelu"] = {"alpha": np.asarray(sd["prelu.weight"], np.float32)}
    for stage, blocks in enumerate(IRESNET50_LAYERS, start=1):
        for i in range(blocks):
            tp = f"layer{stage}.{i}"
            name = f"layer{stage}_{i}"
            bp, bs = {}, {}
            bp["bn1"], bs["bn1"] = _bn_t(sd, f"{tp}.bn1")
            bp["conv1"] = {"kernel": _conv_t(sd[f"{tp}.conv1.weight"])}
            bp["bn2"], bs["bn2"] = _bn_t(sd, f"{tp}.bn2")
            bp["prelu"] = {"alpha": np.asarray(sd[f"{tp}.prelu.weight"],
                                               np.float32)}
            bp["conv2"] = {"kernel": _conv_t(sd[f"{tp}.conv2.weight"])}
            bp["bn3"], bs["bn3"] = _bn_t(sd, f"{tp}.bn3")
            if f"{tp}.downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv_t(sd[f"{tp}.downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = _bn_t(sd, f"{tp}.downsample.1")
            params[name], stats[name] = bp, bs
    params["bn2"], stats["bn2"] = _bn_t(sd, "bn2")
    params["fc"] = {"kernel": np.asarray(sd["fc.weight"], np.float32).T,
                    "bias": np.asarray(sd["fc.bias"], np.float32)}
    params["features"], stats["features"] = _bn_t(sd, "features")
    return {"params": params, "batch_stats": stats}


def synthetic_arcface_state_dict(rng=None):
    """A state dict with EXACTLY the published iresnet50 key names/shapes
    (for converter round-trip tests without network egress)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k):
        scale = 1.0 / np.sqrt(cin * k * k)  # keep activations O(1) over depth
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * scale

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    sd["prelu.weight"] = rng.uniform(0.1, 0.4, 64).astype(np.float32)
    cin = 64
    for stage, (blocks, feats) in enumerate(
            zip(IRESNET50_LAYERS, (64, 128, 256, 512)), start=1):
        for i in range(blocks):
            tp = f"layer{stage}.{i}"
            bn(f"{tp}.bn1", cin)
            conv(f"{tp}.conv1", feats, cin, 3)
            bn(f"{tp}.bn2", feats)
            sd[f"{tp}.prelu.weight"] = rng.uniform(0.1, 0.4, feats).astype(np.float32)
            conv(f"{tp}.conv2", feats, feats, 3)
            bn(f"{tp}.bn3", feats)
            if i == 0:  # every stage's first block strides and widens
                conv(f"{tp}.downsample.0", feats, cin, 1)
                bn(f"{tp}.downsample.1", feats)
            cin = feats
    bn("bn2", 512)
    sd["fc.weight"] = rng.standard_normal((512, 512 * 7 * 7)).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(512, np.float32)
    bn("features", 512)
    return sd


def merge_into_init(init_tree, converted_tree):
    """Overlay converted leaves onto a module's init tree.

    Guarantees the result loads into the module (exact structure); any init
    leaf the converter did not provide keeps its init value and is returned
    in `missing` for the conversion report. Shape mismatches raise.
    """
    init_flat = flatten_tree(init_tree)
    conv_flat = flatten_tree(converted_tree)
    merged, missing = {}, []
    for path, leaf in init_flat.items():
        if path in conv_flat:
            got = np.asarray(conv_flat[path])
            if got.shape != tuple(np.shape(leaf)):
                raise ValueError(f"{path}: converted shape {got.shape} != "
                                 f"module shape {np.shape(leaf)}")
            merged[path] = got
        else:
            merged[path] = np.asarray(leaf)
            missing.append(path)
    extra = sorted(set(conv_flat) - set(init_flat))
    return unflatten_tree(merged), missing, extra


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
    flat = flatten_tree(params)
    # zlib buys nothing on float weights (near-incompressible) and costs
    # minutes at multi-GB scale (Qwen3-VL, RAM++); compress small trees only
    total = sum(v.nbytes for v in flat.values())
    if total > 256 * 1024 * 1024:
        np.savez(path, **flat)
    else:
        np.savez_compressed(path, **flat)


def load_params(path):
    data = np.load(path)
    return unflatten_tree({k: data[k] for k in data.files})


def synthetic_samp_state_dict(rng=None):
    """State dict with the CADB SAMP-Net checkpoint's names and shapes
    (for converter/drill tests without network egress)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def t(shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    # backbone: Sequential(resnet18 children[:-2]) -> 0=conv1, 1=bn1, 4..7
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


def synthetic_u2netp_state_dict(rng=None):
    """State dict with the published u2netp.pth key names/shapes, derived
    by INVERTING tools/convert_checkpoints.convert_u2netp's name map over
    our U2NETP module's init tree — so every key the converter reads
    exists with the exact shape it expects."""
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.u2netp import U2NETP

    from facet_tpu.models.checkpoints import fallback_init, sds

    rng = rng or np.random.default_rng(0)
    tree = fallback_init(U2NETP(), sds((1, 64, 64, 3)))
    params = tree["params"]
    stats = tree.get("batch_stats", {})
    sd = {}

    def emit_rebn(node, bn_node, tprefix):
        kernel = np.asarray(node["Conv_0"]["kernel"])
        sd[tprefix + ".conv_s1.weight"] = rng.standard_normal(
            (kernel.shape[3], kernel.shape[2], kernel.shape[0],
             kernel.shape[1])).astype(np.float32) * 0.05
        sd[tprefix + ".conv_s1.bias"] = np.zeros(kernel.shape[3], np.float32)
        c = kernel.shape[3]
        sd[tprefix + ".bn_s1.weight"] = np.ones(c, np.float32)
        sd[tprefix + ".bn_s1.bias"] = np.zeros(c, np.float32)
        sd[tprefix + ".bn_s1.running_mean"] = np.zeros(c, np.float32)
        sd[tprefix + ".bn_s1.running_var"] = np.ones(c, np.float32)

    def emit_rsu(stage, tprefix, depth):
        node, bn = params[stage], stats.get(stage, {})
        emit_rebn(node["convin"], bn.get("convin"), tprefix + ".rebnconvin")
        for d in range(depth - 1):
            emit_rebn(node[f"enc{d}"], bn.get(f"enc{d}"),
                      f"{tprefix}.rebnconv{d + 1}")
        emit_rebn(node["bottom"], bn.get("bottom"),
                  f"{tprefix}.rebnconv{depth}")
        for d in range(depth - 1):
            emit_rebn(node[f"dec{d}"], bn.get(f"dec{d}"),
                      f"{tprefix}.rebnconv{d + 1}d")

    def emit_rsu4f(stage, tprefix):
        node, bn = params[stage], stats.get(stage, {})
        emit_rebn(node["convin"], bn.get("convin"), tprefix + ".rebnconvin")
        for i, name in enumerate(("enc0", "enc1", "enc2")):
            emit_rebn(node[name], bn.get(name), f"{tprefix}.rebnconv{i + 1}")
        emit_rebn(node["bottom"], bn.get("bottom"), f"{tprefix}.rebnconv4")
        for i, name in enumerate(("dec2", "dec1", "dec0")):
            emit_rebn(node[name], bn.get(name), f"{tprefix}.rebnconv{3 - i}d")

    for stage, depth in (("stage1", 7), ("stage2", 6), ("stage3", 5),
                         ("stage4", 4), ("stage4d", 4), ("stage3d", 5),
                         ("stage2d", 6), ("stage1d", 7)):
        emit_rsu(stage, stage, depth)
    for stage in ("stage5", "stage6", "stage5d"):
        emit_rsu4f(stage, stage)
    for i in range(1, 7):
        kernel = np.asarray(params[f"side{i}"]["kernel"])
        sd[f"side{i}.weight"] = rng.standard_normal(
            (kernel.shape[3], kernel.shape[2], kernel.shape[0],
             kernel.shape[1])).astype(np.float32) * 0.05
        sd[f"side{i}.bias"] = np.zeros(kernel.shape[3], np.float32)
    kernel = np.asarray(params["outconv"]["kernel"])
    sd["outconv.weight"] = rng.standard_normal(
        (kernel.shape[3], kernel.shape[2], kernel.shape[0],
         kernel.shape[1])).astype(np.float32) * 0.05
    sd["outconv.bias"] = np.zeros(kernel.shape[3], np.float32)
    return sd


def convert_swin(sd, prefix="visual_encoder.", depths=None):
    """torch Swin (official naming, as in the ram_plus checkpoint's
    visual_encoder.*) -> flax SwinTransformer tree (models/swin.py).

    depths are inferred from the key set when not given."""
    if depths is None:
        import re

        counts = {}
        for k in sd:
            m = re.match(rf"{re.escape(prefix)}layers\.(\d+)\.blocks\.(\d+)\.",
                         k)
            if m:
                i, j = int(m.group(1)), int(m.group(2))
                counts[i] = max(counts.get(i, 0), j + 1)
        depths = tuple(counts[i] for i in sorted(counts))
    tree = {
        "patch_proj": {"kernel": _conv_t(sd[prefix + "patch_embed.proj.weight"]),
                       "bias": np.asarray(sd[prefix + "patch_embed.proj.bias"],
                                          np.float32)},
        "patch_norm": _ln(sd[prefix + "patch_embed.norm.weight"],
                          sd[prefix + "patch_embed.norm.bias"]),
        "norm": _ln(sd[prefix + "norm.weight"], sd[prefix + "norm.bias"]),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"{prefix}layers.{i}.blocks.{j}."
            tree[f"layers{i}_block{j}"] = {
                "norm1": _ln(sd[p + "norm1.weight"], sd[p + "norm1.bias"]),
                "attn": {
                    "qkv": _dense(sd[p + "attn.qkv.weight"],
                                  sd[p + "attn.qkv.bias"]),
                    "proj": _dense(sd[p + "attn.proj.weight"],
                                   sd[p + "attn.proj.bias"]),
                    "relative_position_bias_table": np.asarray(
                        sd[p + "attn.relative_position_bias_table"],
                        np.float32),
                },
                "norm2": _ln(sd[p + "norm2.weight"], sd[p + "norm2.bias"]),
                "fc1": _dense(sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]),
                "fc2": _dense(sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"]),
            }
        if i < len(depths) - 1:
            p = f"{prefix}layers.{i}.downsample."
            tree[f"layers{i}_downsample"] = {
                "norm": _ln(sd[p + "norm.weight"], sd[p + "norm.bias"]),
                "reduction": _dense(sd[p + "reduction.weight"]),
            }
    return tree


def convert_ram_plus(sd, layers=None):
    """recognize-anything ram_plus state dict -> flax RAMPlusNet tree.

    Returns (params_tree, unmapped_keys). The label_embed / reweight_scale /
    per-class fc probe ride in the tree; the tag list and thresholds are
    separate text files next to the checkpoint (handled by the tool).
    """
    if layers is None:
        layers = 1 + max(
            (int(k.split(".")[3]) for k in sd
             if k.startswith("tagging_head.encoder.layer.")), default=-1)
    used = set()
    tracking = _TrackingDict(sd, used)
    params = {"visual_encoder": convert_swin(tracking)}
    params["image_proj"] = _dense(sd["image_proj.weight"],
                                  sd["image_proj.bias"])
    used.update({"image_proj.weight", "image_proj.bias"})
    params["label_embed"] = np.asarray(sd["label_embed"], np.float32)
    used.add("label_embed")
    if "reweight_scale" in sd:
        params["reweight_scale"] = np.float32(
            np.asarray(sd["reweight_scale"]).reshape(()))
        used.add("reweight_scale")
    params["wordvec_proj"] = _dense(sd["wordvec_proj.weight"],
                                    sd["wordvec_proj.bias"])
    used.update({"wordvec_proj.weight", "wordvec_proj.bias"})

    for i in range(layers):
        p = f"tagging_head.encoder.layer.{i}."
        params[f"tag_layer{i}"] = {
            "att_query": _dense(sd[p + "crossattention.self.query.weight"],
                                sd[p + "crossattention.self.query.bias"]),
            "att_key": _dense(sd[p + "crossattention.self.key.weight"],
                              sd[p + "crossattention.self.key.bias"]),
            "att_value": _dense(sd[p + "crossattention.self.value.weight"],
                                sd[p + "crossattention.self.value.bias"]),
            "att_out": _dense(sd[p + "crossattention.output.dense.weight"],
                              sd[p + "crossattention.output.dense.bias"]),
            "att_norm": _ln(sd[p + "crossattention.output.LayerNorm.weight"],
                            sd[p + "crossattention.output.LayerNorm.bias"]),
            "ffn_in": _dense(sd[p + "intermediate.dense.weight"],
                             sd[p + "intermediate.dense.bias"]),
            "ffn_out": _dense(sd[p + "output.dense.weight"],
                              sd[p + "output.dense.bias"]),
            "ffn_norm": _ln(sd[p + "output.LayerNorm.weight"],
                            sd[p + "output.LayerNorm.bias"]),
        }
        used.update(p + k for k in (
            "crossattention.self.query.weight", "crossattention.self.query.bias",
            "crossattention.self.key.weight", "crossattention.self.key.bias",
            "crossattention.self.value.weight", "crossattention.self.value.bias",
            "crossattention.output.dense.weight",
            "crossattention.output.dense.bias",
            "crossattention.output.LayerNorm.weight",
            "crossattention.output.LayerNorm.bias",
            "intermediate.dense.weight", "intermediate.dense.bias",
            "output.dense.weight", "output.dense.bias",
            "output.LayerNorm.weight", "output.LayerNorm.bias"))

    # GroupWiseLinear: fc.W (1, num_class, hidden), fc.b (1, num_class)
    params["fc_w"] = np.asarray(sd["fc.W"], np.float32).reshape(
        -1, np.asarray(sd["fc.W"]).shape[-1])
    params["fc_b"] = np.asarray(sd["fc.b"], np.float32).reshape(-1)
    used.update({"fc.W", "fc.b"})

    unmapped = [k for k in sd
                if k not in used and "relative_position_index" not in k
                and "attn_mask" not in k]
    return {"params": params}, unmapped


class _TrackingDict(dict):
    """Wraps a state dict, recording which keys a converter consumed."""

    def __init__(self, base, used):
        super().__init__(base)
        self._used = used

    def __getitem__(self, key):
        self._used.add(key)
        return super().__getitem__(key)


def synthetic_ram_plus_state_dict(rng=None, config=None):
    """A ram_plus-layout state dict at a reduced config, for converter and
    drill tests (full Swin-L would be ~900 MB of synthetic weights)."""
    from facet_tpu.models.ram_plus import RAMPlusConfig
    from facet_tpu.models.swin import SwinConfig

    rng = rng or np.random.default_rng(0)
    cfg = config or RAMPlusConfig(
        num_class=17, des_per_class=3, embed_width=16, hidden=24, heads=4,
        intermediate=48,
        swin=SwinConfig(image_size=48, embed_dim=8, depths=(1, 1),
                        heads=(2, 4), window=6))
    swin = cfg.swin
    sd = {}

    def dense(name, dout, din, bias=True):
        sd[name + ".weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.05
        if bias:
            sd[name + ".bias"] = np.zeros(dout, np.float32)

    def ln(name, dim):
        sd[name + ".weight"] = np.ones(dim, np.float32)
        sd[name + ".bias"] = np.zeros(dim, np.float32)

    p = swin.patch_size
    sd["visual_encoder.patch_embed.proj.weight"] = rng.standard_normal(
        (swin.embed_dim, 3, p, p)).astype(np.float32) * 0.05
    sd["visual_encoder.patch_embed.proj.bias"] = np.zeros(
        swin.embed_dim, np.float32)
    ln("visual_encoder.patch_embed.norm", swin.embed_dim)
    dim = swin.embed_dim
    for i, (depth, heads) in enumerate(zip(swin.depths, swin.heads)):
        for j in range(depth):
            b = f"visual_encoder.layers.{i}.blocks.{j}."
            ln(b + "norm1", dim)
            dense(b + "attn.qkv", 3 * dim, dim)
            dense(b + "attn.proj", dim, dim)
            sd[b + "attn.relative_position_bias_table"] = (
                rng.standard_normal(((2 * swin.window - 1) ** 2, heads))
                .astype(np.float32) * 0.05)
            ln(b + "norm2", dim)
            dense(b + "mlp.fc1", 4 * dim, dim)
            dense(b + "mlp.fc2", dim, 4 * dim)
        if i < len(swin.depths) - 1:
            d = f"visual_encoder.layers.{i}.downsample."
            ln(d + "norm", 4 * dim)
            dense(d + "reduction", 2 * dim, 4 * dim, bias=False)
            dim *= 2
    ln("visual_encoder.norm", dim)

    dense("image_proj", cfg.embed_width, dim)
    sd["label_embed"] = rng.standard_normal(
        (cfg.num_class * cfg.des_per_class,
         cfg.embed_width)).astype(np.float32) * 0.05
    sd["reweight_scale"] = np.asarray([np.log(1 / 0.07)], np.float32)
    dense("wordvec_proj", cfg.hidden, cfg.embed_width)
    for i in range(cfg.layers):
        t = f"tagging_head.encoder.layer.{i}."
        dense(t + "crossattention.self.query", cfg.hidden, cfg.hidden)
        dense(t + "crossattention.self.key", cfg.hidden, cfg.embed_width)
        dense(t + "crossattention.self.value", cfg.hidden, cfg.embed_width)
        dense(t + "crossattention.output.dense", cfg.hidden, cfg.hidden)
        ln(t + "crossattention.output.LayerNorm", cfg.hidden)
        dense(t + "intermediate.dense", cfg.intermediate, cfg.hidden)
        dense(t + "output.dense", cfg.hidden, cfg.intermediate)
        ln(t + "output.LayerNorm", cfg.hidden)
    sd["fc.W"] = rng.standard_normal(
        (1, cfg.num_class, cfg.hidden)).astype(np.float32) * 0.05
    sd["fc.b"] = np.zeros((1, cfg.num_class), np.float32)
    return sd, cfg


# ------------------------------------------------------ HyperIQA and DBCNN


def convert_hyperiqa(state_dict):
    """Published HyperIQA checkpoint (official repo / pyiqa `hyperiqa.pth`,
    the HyperNet(16, 112, 224, 112, 56, 28, 14, 7) state dict) -> our
    HyperIQANet tree (models/iqa_extra.py). Key map in docs/CONVERTERS.md.

    Returns (tree, unmapped_keys). Unconsumed source keys are reported, not
    silently dropped, so a one-time run against the real checkpoint
    surfaces any naming drift immediately.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    res_sd = {k[len("res."):]: v for k, v in sd.items()
              if k.startswith("res.") and "lda" not in k}
    consumed.update("res." + k for k in res_sd)
    params, stats = convert_torchvision_resnet50(res_sd)

    p = {"res": params}
    for i in (1, 2, 3):
        p[f"lda{i}_conv"] = {"kernel": _conv_t(take(f"res.lda{i}_pool.0.weight"))}
    for i in (1, 2, 3, 4):
        p[f"lda{i}_fc"] = _dense(take(f"res.lda{i}_fc.weight"),
                                 take(f"res.lda{i}_fc.bias"))
    # hypernetwork trunk: the published Sequential conv1.{0,2,4}
    for fi, ti in enumerate((0, 2, 4)):
        p[f"hconv{fi}"] = {"kernel": _conv_t(take(f"conv1.{ti}.weight")),
                           "bias": np.asarray(take(f"conv1.{ti}.bias"),
                                              np.float32)}
    for li in (1, 2, 3, 4):
        p[f"fc{li}w_conv"] = {
            "kernel": _conv_t(take(f"fc{li}w_conv.weight")),
            "bias": np.asarray(take(f"fc{li}w_conv.bias"), np.float32)}
        p[f"fc{li}b_fc"] = _dense(take(f"fc{li}b_fc.weight"),
                                  take(f"fc{li}b_fc.bias"))
    p["fc5w_fc"] = _dense(take("fc5w_fc.weight"), take("fc5w_fc.bias"))
    p["fc5b_fc"] = _dense(take("fc5b_fc.weight"), take("fc5b_fc.bias"))

    unmapped = sorted(k for k in sd
                      if k not in consumed and "num_batches_tracked" not in k)
    return {"params": p, "batch_stats": {"res": stats}}, unmapped


def synthetic_hyperiqa_state_dict(rng=None):
    """Published HyperNet key names + shapes (no egress needed). Verified
    against an independent torch transcription with strict=True in
    tests/test_convert_iqa_extra.py."""
    rng = rng or np.random.default_rng(0)
    sd = synthetic_resnet50_state_dict(rng, prefix="res.")

    def conv(name, cout, cin, k, bias=True):
        scale = 1.0 / np.sqrt(cin * k * k)
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * scale
        if bias:
            sd[name + ".bias"] = rng.standard_normal(cout).astype(
                np.float32) * 0.01

    def fc(name, dout, din):
        sd[name + ".weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) / np.sqrt(din)
        sd[name + ".bias"] = rng.standard_normal(dout).astype(np.float32) * 0.01

    conv("res.lda1_pool.0", 16, 256, 1, bias=False)
    conv("res.lda2_pool.0", 32, 512, 1, bias=False)
    conv("res.lda3_pool.0", 64, 1024, 1, bias=False)
    fc("res.lda1_fc", 16, 16 * 64)
    fc("res.lda2_fc", 16, 32 * 16)
    fc("res.lda3_fc", 16, 64 * 4)
    fc("res.lda4_fc", 176, 2048)
    conv("conv1.0", 1024, 2048, 1)
    conv("conv1.2", 512, 1024, 1)
    conv("conv1.4", 112, 512, 1)
    dims = (224, 112, 56, 28, 14)
    for li in range(1, 5):
        din, dout = dims[li - 1], dims[li]
        conv(f"fc{li}w_conv", din * dout // 49, 112, 3)
        fc(f"fc{li}b_fc", dout, 112)
    fc("fc5w_fc", 14, 112)
    fc("fc5b_fc", 1, 112)
    return sd


_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_CONV_DIMS = ((64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
                    (256, 256), (256, 256), (512, 256), (512, 512),
                    (512, 512), (512, 512), (512, 512), (512, 512))
_SCNN_CONV_IDX = (0, 3, 6, 9, 12, 15, 18, 21, 24)
_SCNN_CONV_DIMS = ((48, 3), (48, 48), (64, 48), (64, 64), (64, 64),
                   (64, 64), (128, 64), (128, 128), (128, 128))


def convert_dbcnn(state_dict):
    """Published DBCNN checkpoint (pyiqa `DBCNN.pth`: `features1.*` VGG-16
    convs, `features2.*` S-CNN conv+bn stack, `fc.*` bilinear head) -> our
    DBCNNNet tree (models/iqa_extra.py). Returns (tree, unmapped_keys)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    vgg = {}
    for idx in _VGG16_CONV_IDX:
        vgg[f"conv{idx}"] = {
            "kernel": _conv_t(take(f"features1.{idx}.weight")),
            "bias": np.asarray(take(f"features1.{idx}.bias"), np.float32)}
    scnn_p, scnn_s = {}, {}
    for idx in _SCNN_CONV_IDX:
        scnn_p[f"conv{idx}"] = {
            "kernel": _conv_t(take(f"features2.{idx}.weight")),
            "bias": np.asarray(take(f"features2.{idx}.bias"), np.float32)}
        bn_p, bn_st = _bn_t(sd, f"features2.{idx + 1}")
        consumed.update(f"features2.{idx + 1}.{f}" for f in
                        ("weight", "bias", "running_mean", "running_var"))
        scnn_p[f"bn{idx + 1}"], scnn_s[f"bn{idx + 1}"] = bn_p, bn_st
    tree = {"params": {"features1": vgg, "features2": scnn_p,
                       "fc": _dense(take("fc.weight"), take("fc.bias"))},
            "batch_stats": {"features2": scnn_s}}
    unmapped = sorted(k for k in sd
                      if k not in consumed and "num_batches_tracked" not in k)
    return tree, unmapped


def synthetic_dbcnn_state_dict(rng=None):
    """Published DBCNN key names + shapes (torchvision VGG-16 `features`
    Sequential indices minus the final maxpool under `features1.`, the
    S-CNN `features` Sequential under `features2.`, `fc`)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin):
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) / np.sqrt(cin * 9)
        sd[name + ".bias"] = rng.standard_normal(cout).astype(np.float32) * 0.01

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(
            np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    for idx, (cout, cin) in zip(_VGG16_CONV_IDX, _VGG16_CONV_DIMS):
        conv(f"features1.{idx}", cout, cin)
    for idx, (cout, cin) in zip(_SCNN_CONV_IDX, _SCNN_CONV_DIMS):
        conv(f"features2.{idx}", cout, cin)
        bn(f"features2.{idx + 1}", cout)
    sd["fc.weight"] = rng.standard_normal(
        (1, 512 * 128)).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(1, np.float32)
    return sd


def convert_musiq(state_dict, layers=14, heads=6):
    """Published MUSIQ torch checkpoint (pyiqa `musiq_koniq_ckpt.pth`
    vocabulary as transcribed in tests/test_convert_musiq.py) -> our
    MUSIQNet tree (models/musiq.py). Key map in docs/CONVERTERS.md.

    Accepts split q/k/v ("...attn.query.weight") and fused
    ("...attn.qkv.weight" with "attn.proj" output) attention vocabularies.
    Returns (tree, unmapped_keys) like convert_hyperiqa.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    root_kernel = np.asarray(take("conv_root.weight"), np.float32)
    cout = root_kernel.shape[0]
    emb_w = np.asarray(take("embedding.weight"), np.float32)
    hidden = emb_w.shape[0]
    side = int(round(np.sqrt(emb_w.shape[1] / cout)))
    # torch flattens the (C, h, w) root feature CHW; the flax module
    # flattens HWC — permute the embedding's input columns
    emb_w = emb_w.reshape(hidden, cout, side, side).transpose(
        0, 2, 3, 1).reshape(hidden, cout * side * side)

    p = {
        "patch_encoder": {
            "conv_root_kernel": _conv_t(root_kernel),
            "gn_root": _ln(take("gn_root.weight"), take("gn_root.bias")),
            "embedding": {"kernel": emb_w.T,
                          "bias": np.asarray(take("embedding.bias"),
                                             np.float32)},
        },
        "cls": np.asarray(take("cls_token"), np.float32).reshape(
            1, 1, hidden),
        "pos_embedding": np.asarray(
            take("pos_embedding"), np.float32).reshape(-1, hidden),
        "scale_embedding": np.asarray(
            take("scale_embedding"), np.float32).reshape(-1, hidden),
        "encoder_norm": _ln(take("transformer.norm.weight"),
                            take("transformer.norm.bias")),
        "head": _dense(take("head.weight"), take("head.bias")),
    }

    head_dim = hidden // heads
    proj = lambda w: np.asarray(w, np.float32).T.reshape(
        hidden, heads, head_dim)
    for i in range(layers):
        bp = f"transformer.blocks.{i}"
        if f"{bp}.attn.qkv.weight" in sd:
            qkv_w = np.split(np.asarray(take(f"{bp}.attn.qkv.weight"),
                                        np.float32), 3, axis=0)
            qkv_b = np.split(np.asarray(take(f"{bp}.attn.qkv.bias"),
                                        np.float32), 3, axis=0)
            ow = take(f"{bp}.attn.proj.weight")
            ob = take(f"{bp}.attn.proj.bias")
        else:
            qkv_w = [take(f"{bp}.attn.{n}.weight")
                     for n in ("query", "key", "value")]
            qkv_b = [take(f"{bp}.attn.{n}.bias")
                     for n in ("query", "key", "value")]
            ow = take(f"{bp}.attn.out.weight")
            ob = take(f"{bp}.attn.out.bias")
        attn = {
            name: {"kernel": proj(w),
                   "bias": np.asarray(b, np.float32).reshape(heads,
                                                             head_dim)}
            for name, w, b in zip(("query", "key", "value"), qkv_w, qkv_b)
        }
        attn["out"] = {
            "kernel": np.asarray(ow, np.float32).T.reshape(
                heads, head_dim, hidden),
            "bias": np.asarray(ob, np.float32)}
        p[f"encoderblock_{i}"] = {
            "ln1": _ln(take(f"{bp}.norm1.weight"), take(f"{bp}.norm1.bias")),
            "attn": attn,
            "ln2": _ln(take(f"{bp}.norm2.weight"), take(f"{bp}.norm2.bias")),
            "mlp_dense1": _dense(take(f"{bp}.mlp.fc1.weight"),
                                 take(f"{bp}.mlp.fc1.bias")),
            "mlp_dense2": _dense(take(f"{bp}.mlp.fc2.weight"),
                                 take(f"{bp}.mlp.fc2.bias")),
        }

    unmapped = sorted(k for k in sd if k not in consumed)
    return {"params": p}, unmapped


def synthetic_musiq_state_dict(rng=None, layers=14, hidden=384,
                               mlp_dim=1152, grid=10, num_scales=3):
    """Published MUSIQ key names + shapes (no egress needed). Verified
    against an independent torch transcription with strict=True in
    tests/test_convert_musiq.py."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def fc(name, dout, din):
        sd[name + ".weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) / np.sqrt(din)
        sd[name + ".bias"] = rng.standard_normal(dout).astype(
            np.float32) * 0.01

    def ln(name, d):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, d).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(d).astype(np.float32) * 0.1

    sd["conv_root.weight"] = rng.standard_normal(
        (64, 3, 7, 7)).astype(np.float32) / np.sqrt(3 * 49)
    ln("gn_root", 64)
    fc("embedding", hidden, 64 * 8 * 8)
    sd["cls_token"] = rng.standard_normal(
        (1, 1, hidden)).astype(np.float32) * 0.02
    sd["pos_embedding"] = rng.standard_normal(
        (grid * grid, hidden)).astype(np.float32) * 0.02
    sd["scale_embedding"] = rng.standard_normal(
        (num_scales, hidden)).astype(np.float32) * 0.02
    for i in range(layers):
        bp = f"transformer.blocks.{i}"
        ln(f"{bp}.norm1", hidden)
        for n in ("query", "key", "value", "out"):
            fc(f"{bp}.attn.{n}", hidden, hidden)
        ln(f"{bp}.norm2", hidden)
        fc(f"{bp}.mlp.fc1", mlp_dim, hidden)
        fc(f"{bp}.mlp.fc2", hidden, mlp_dim)
    ln("transformer.norm", hidden)
    fc("head", 1, hidden)
    return sd

"""Real-weight readiness drill: the full install path, end to end.

Builds a synthetic checkpoint directory in the exact PUBLISHED formats the
converters consume (a Hugging Face CLIP pytorch_model.bin at full ViT-L/14
size, the aesthetic-head .pth, u2netp.pth, samp_net.pth, an arcface_torch
backbone.pth, a pyiqa cfanet_nr_koniq_res50.pth), runs the real converter
CLI (tools/convert_checkpoints.py) as a subprocess, then scores an image
through the engine with FACET_PRETRAINED_DIR pointing at the converted
output — proving that when real weights arrive, `download + convert +
scan` works with no code changes. (The ONNX-only insightface leg needs the
`onnx` package and is exercised separately when available; the Qwen
safetensors leg is covered at tiny scale by the qwen parity tests.)
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENGINE_FAMILIES = (
    "clip_vit_l14_vision", "aesthetic_head", "u2netp", "samp_net",
    "arcface_iresnet50", "topiq",
)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    source = tmp_path_factory.mktemp("checkpoints")
    out = tmp_path_factory.mktemp("pretrained")

    # --- HF CLIP at full ViT-L/14 size (vision + text towers, one file)
    from transformers import (CLIPTextConfig, CLIPTextModelWithProjection,
                              CLIPVisionConfig, CLIPVisionModelWithProjection)

    torch.manual_seed(0)
    vision = CLIPVisionModelWithProjection(CLIPVisionConfig(
        image_size=224, patch_size=14, hidden_size=1024,
        num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, projection_dim=768, hidden_act="gelu"))
    text = CLIPTextModelWithProjection(CLIPTextConfig(
        vocab_size=49408, max_position_embeddings=77, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, projection_dim=768, hidden_act="gelu"))
    sd = {}
    sd.update(vision.state_dict())
    sd.update(text.state_dict())
    torch.save(sd, source / "pytorch_model.bin")
    del vision, text, sd

    # --- aesthetic head (Linear(768,256) -> ReLU -> Linear(256,1))
    rng = np.random.default_rng(0)
    torch.save({
        "0.weight": torch.tensor(rng.standard_normal((256, 768)),
                                 dtype=torch.float32),
        "0.bias": torch.zeros(256),
        "2.weight": torch.tensor(rng.standard_normal((1, 256)),
                                 dtype=torch.float32) * 0.1,
        "2.bias": torch.zeros(1),
    }, source / "aesthetic_predictor_weights.pth")

    # --- published-layout synthetic dicts for the conv families
    from facet_tpu.models.convert import (
        synthetic_arcface_state_dict,
        synthetic_samp_state_dict,
        synthetic_topiq_state_dict,
        synthetic_u2netp_state_dict,
    )

    def save_pth(name, sd_np):
        torch.save({k: torch.tensor(v) for k, v in sd_np.items()},
                   source / name)

    save_pth("u2netp.pth", synthetic_u2netp_state_dict())
    save_pth("samp_net.pth", synthetic_samp_state_dict())
    save_pth("backbone.pth", synthetic_arcface_state_dict())
    save_pth("cfanet_nr_koniq_res50.pth", synthetic_topiq_state_dict())

    env = dict(os.environ, FACET_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_checkpoints.py"),
         "--source", str(source), "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return out, proc.stdout


def test_converters_produce_every_engine_family(converted):
    out, log = converted
    for family in ENGINE_FAMILIES:
        assert os.path.exists(os.path.join(out, f"{family}.npz")), (
            family, log)
    assert "converted CLIP vision tower" in log
    assert "converted CLIP text tower" in log


def test_engine_scores_with_converted_weights(converted, tmp_path):
    """A dry-run scan against FACET_PRETRAINED_DIR must load every
    converted family (no random-init warning for them) and score."""
    from PIL import Image

    out, _ = converted
    pics = tmp_path / "pics"
    pics.mkdir()
    arr = (np.random.default_rng(1).random((96, 128, 3)) * 255).astype(
        np.uint8)
    Image.fromarray(arr).save(pics / "one.jpg")

    env = dict(os.environ, FACET_PLATFORM="cpu",
               FACET_PRETRAINED_DIR=str(out),
               # ONE virtual device: the scan itself needs no mesh, and the
               # conftest-inherited 8-device flag makes XLA's 8-thread
               # all-gather rendezvous (hard 40 s timeout) flake when the
               # single-core host is busy
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "photos.py"), str(pics),
         "--dry-run", "--db", str(tmp_path / "drill.db")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "aggregate" in proc.stdout
    blob = proc.stdout + proc.stderr
    for family in ENGINE_FAMILIES:
        assert f"no converted checkpoint for '{family}'" not in blob, family

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

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests", "fixtures"))

ENGINE_FAMILIES = (
    "clip_vit_l14_vision", "aesthetic_head", "u2netp", "samp_net",
    "arcface_iresnet50", "topiq", "hyperiqa", "dbcnn", "musiq",
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

    # --- aesthetic head: the REAL improved-aesthetic-predictor format
    # (layers.* purely-affine MLP) under the reference's own download
    # filename — the layout the reference itself silently fails to load
    # (strict=False; tests/test_convert_aesthetic.py)
    rng = np.random.default_rng(0)
    aes = {}
    for i, (dout, din) in zip((0, 2, 4, 6, 7),
                              ((1024, 768), (128, 1024), (64, 128),
                               (16, 64), (1, 16))):
        aes[f"layers.{i}.weight"] = torch.tensor(
            rng.standard_normal((dout, din)).astype(np.float32)
            / np.sqrt(din))
        aes[f"layers.{i}.bias"] = torch.zeros(dout)
    torch.save(aes, source / "sac+logos+ava1-l14-linearMSE.pth")

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

    from facet_tpu.models.convert import (
        synthetic_dbcnn_state_dict,
        synthetic_hyperiqa_state_dict,
        synthetic_musiq_state_dict,
    )

    save_pth("u2netp.pth", synthetic_u2netp_state_dict())
    save_pth("samp_net.pth", synthetic_samp_state_dict())
    save_pth("backbone.pth", synthetic_arcface_state_dict())
    save_pth("cfanet_nr_koniq_res50.pth", synthetic_topiq_state_dict())
    save_pth("hyperiqa.pth", synthetic_hyperiqa_state_dict())
    save_pth("DBCNN.pth", synthetic_dbcnn_state_dict())
    save_pth("musiq_koniq_ckpt.pth", synthetic_musiq_state_dict())

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


class TestInsightfaceOnnxDrill:
    """The ONNX-only leg (VERDICT r3 #4): synthesize buffalo_l-format
    .onnx files at real dims with tests/fixtures/onnx_writer.py, then run
    tools/convert_insightface.py end-to-end WITHOUT the `onnx` package
    (the CLI falls back to facet_tpu/models/onnx_pb.py)."""

    @staticmethod
    def _sd_to_onnx(path, sd):
        """State dict -> ONNX whose initializer names/shapes match the
        published export and whose nodes give each weight its consumer op
        (Conv / BatchNormalization / Mul) for the manifest."""
        from onnx_writer import write_model

        inits, nodes, done = [], [], set()
        prev, i = "input.1", 0
        for key, arr in sd.items():
            if "num_batches_tracked" in key or key in done:
                continue
            base = key[: -len(".weight")] if key.endswith(".weight") else key
            if key.endswith(".weight") and base + ".running_mean" in sd:
                names = [base + s for s in (".weight", ".bias",
                                            ".running_mean", ".running_var")]
                for n in names:
                    inits.append((n, sd[n]))
                    done.add(n)
                out = f"t{i}"
                i += 1
                nodes.append(("BatchNormalization", [prev] + names, [out],
                              {"epsilon": 1e-5}))
                prev = out
            elif key.endswith(".weight") and np.ndim(arr) == 4:
                ins = [prev, key]
                inits.append((key, arr))
                done.add(key)
                if base + ".bias" in sd:
                    ins.append(base + ".bias")
                    inits.append((base + ".bias", sd[base + ".bias"]))
                    done.add(base + ".bias")
                out = f"t{i}"
                i += 1
                k = arr.shape[2]
                nodes.append(("Conv", ins, [out],
                              {"strides": [1, 1], "group": 1,
                               "kernel_shape": [k, k], "pads": [k // 2] * 4}))
                prev = out
            else:   # scalars (bbox_head.scales.*) and leftovers
                inits.append((key, np.asarray(arr)))
                done.add(key)
                out = f"t{i}"
                i += 1
                nodes.append(("Mul", [prev, key], [out], {}))
                prev = out
        write_model(path, inits, nodes)

    @pytest.fixture(scope="class")
    def out_dir(self, tmp_path_factory):
        return tmp_path_factory.mktemp("onnx_converted")

    def _run_cli(self, model_path, out_dir):
        env = dict(os.environ, FACET_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1",
                   PYTHONPATH=REPO + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        return subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "convert_insightface.py"),
             str(model_path), "--out", str(out_dir)],
            capture_output=True, text=True, env=env, timeout=900)

    def test_det_10g_onnx_converts_exactly(self, tmp_path, out_dir):
        """det_10g.onnx at REAL SCRFD-10G dims -> scrfd_detector.npz,
        numerically identical to the direct state-dict conversion."""
        from facet_tpu.models.convert import load_params
        from facet_tpu.models.scrfd import (SCRFD_10G, convert_scrfd,
                                            synthetic_scrfd_state_dict)

        sd = synthetic_scrfd_state_dict(SCRFD_10G)
        onnx_path = tmp_path / "det_10g.onnx"
        self._sd_to_onnx(onnx_path, sd)
        proc = self._run_cli(onnx_path, out_dir)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "inferred SCRFD config" in proc.stdout
        assert "WARNING" not in proc.stdout, proc.stdout
        got = load_params(os.path.join(out_dir, "scrfd_detector.npz"))
        want, report = convert_scrfd(sd, SCRFD_10G, verbose=False)
        assert not report["missing"]
        got_flat = jax.tree_util.tree_leaves_with_path(got)
        want_flat = jax.tree_util.tree_leaves_with_path(want)
        assert len(got_flat) == len(want_flat)
        for (kp_g, leaf_g), (kp_w, leaf_w) in zip(got_flat, want_flat):
            assert kp_g == kp_w
            np.testing.assert_array_equal(np.asarray(leaf_g),
                                          np.asarray(leaf_w))

    def test_w600k_onnx_converts(self, tmp_path, out_dir):
        """w600k_r50.onnx (torch-export names) -> arcface_iresnet50.npz."""
        from facet_tpu.models.convert import (load_params,
                                              synthetic_arcface_state_dict)
        from onnx_writer import write_model

        sd = synthetic_arcface_state_dict()
        inits = [(k, np.asarray(v)) for k, v in sd.items()
                 if "num_batches_tracked" not in k]
        write_model(tmp_path / "w600k_r50.onnx", inits, [])
        proc = self._run_cli(tmp_path / "w600k_r50.onnx", out_dir)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        tree = load_params(os.path.join(out_dir, "arcface_iresnet50.npz"))
        assert "params" in tree

    def test_2d106det_onnx_serializes_and_executes(self, tmp_path, out_dir):
        """A 2d106det-shaped graph (192x192 in, 212 landmarks out, MXNet
        export ops) -> landmark_106_graph.npz that GraphRunner executes."""
        from onnx_writer import write_model

        rng = np.random.default_rng(3)
        c = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
        inits = [
            ("conv0_w", c(8, 3, 3, 3)), ("conv0_b", np.zeros(8, np.float32)),
            ("prelu0_a", np.full(8, 0.25, np.float32)),
            ("conv1_w", c(16, 8, 3, 3)), ("conv1_b", np.zeros(16, np.float32)),
            ("fc_w", c(212, 16)), ("fc_b", np.zeros(212, np.float32)),
        ]
        nodes = [
            ("Conv", ["data", "conv0_w", "conv0_b"], ["c0"],
             {"strides": [2, 2], "pads": [1, 1, 1, 1],
              "kernel_shape": [3, 3], "group": 1}),
            ("PRelu", ["c0", "prelu0_a"], ["p0"], {}),
            ("MaxPool", ["p0"], ["m0"],
             {"kernel_shape": [2, 2], "strides": [2, 2],
              "pads": [0, 0, 0, 0]}),
            ("Conv", ["m0", "conv1_w", "conv1_b"], ["c1"],
             {"strides": [2, 2], "pads": [1, 1, 1, 1],
              "kernel_shape": [3, 3], "group": 1}),
            ("Relu", ["c1"], ["r1"], {}),
            ("GlobalAveragePool", ["r1"], ["g1"], {}),
            ("Flatten", ["g1"], ["f1"], {"axis": 1}),
            ("Gemm", ["f1", "fc_w", "fc_b"], ["fc1"],
             {"transB": 1, "alpha": 1.0, "beta": 1.0}),
        ]
        write_model(tmp_path / "2d106det.onnx", inits, nodes)
        proc = self._run_cli(tmp_path / "2d106det.onnx", out_dir)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "executes via GraphRunner" in proc.stdout
        from facet_tpu.models.onnx_exec import load_graph

        runner = load_graph(os.path.join(out_dir, "landmark_106_graph.npz"))
        out = runner(np.zeros((1, 3, 192, 192), np.float32))
        assert out[0].shape == (1, 212)

    def test_onnx_pb_reader_matches_writer_roundtrip(self):
        """Byte-level sanity: every payload type survives write -> parse."""
        from facet_tpu.models.onnx_pb import load_model
        from onnx_writer import build_model
        import tempfile

        arr4 = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
        scalar = np.asarray(1.5, np.float32)
        i64 = np.asarray([1, -2, 3], np.int64)
        nodes = [("Conv", ["x", "w"], ["y"],
                  {"strides": [2, 2], "group": 1, "alpha": 0.5,
                   "mode": "nearest"}),
                 ("Constant", [], ["k"], {"value": i64}),
                 ("Reshape", ["y", "k"], ["z"], {})]
        blob = build_model([("w", arr4), ("s", scalar)], nodes)
        with tempfile.NamedTemporaryFile(suffix=".onnx") as fh:
            fh.write(blob)
            fh.flush()
            inits, parsed_nodes = load_model(fh.name)
        d = dict(inits)
        np.testing.assert_array_equal(d["w"], arr4)
        assert d["s"].shape == () and d["s"] == 1.5
        np.testing.assert_array_equal(d["k"], i64)   # Constant folded
        assert len(parsed_nodes) == 2
        op, ins, outs, attrs = parsed_nodes[0]
        assert (op, ins, outs) == ("Conv", ["x", "w"], ["y"])
        assert attrs["strides"] == [2, 2] and attrs["group"] == 1
        assert attrs["alpha"] == pytest.approx(0.5)
        assert attrs["mode"] == "nearest"


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

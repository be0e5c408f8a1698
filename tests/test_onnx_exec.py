"""GraphRunner: ONNX-graph execution parity against torch for the
mobile-CNN op vocabulary (2d106det-style exports), plus serialization."""

import numpy as np
import pytest


def build_mobile_graph(rng):
    """Hand-built (inits, nodes) for a small MobileNet-ish model:
    conv(s2) -> BN -> PReLU -> depthwise(s1) -> BN -> PReLU -> pointwise
    -> BN -> residual Add -> AveragePool(ceil) -> Flatten -> Gemm.
    Mirrors the op/attr patterns MXNet exports use (pads, group, eps)."""
    C1, C2 = 6, 8
    w = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.2
    inits = [
        ("conv0_w", w(C1, 3, 3, 3)),
        ("bn0_scale", w(C1) * 0.2 + 1.0), ("bn0_bias", w(C1)),
        ("bn0_mean", w(C1)), ("bn0_var", np.abs(w(C1)) + 0.5),
        ("prelu0_a", np.abs(w(C1, 1, 1)) * 0.3),
        ("dw_w", w(C1, 1, 3, 3)),
        ("bn1_scale", w(C1) * 0.2 + 1.0), ("bn1_bias", w(C1)),
        ("bn1_mean", w(C1)), ("bn1_var", np.abs(w(C1)) + 0.5),
        ("prelu1_a", np.abs(w(C1, 1, 1)) * 0.3),
        ("pw_w", w(C1, C1, 1, 1)),
        ("bn2_scale", w(C1) * 0.2 + 1.0), ("bn2_bias", w(C1)),
        ("bn2_mean", w(C1)), ("bn2_var", np.abs(w(C1)) + 0.5),
        ("fc_w", w(C1 * 3 * 3, C2)), ("fc_b", w(C2)),
    ]
    eps = 1e-3    # MXNet BatchNorm default
    nodes = [
        ("Conv", ["x", "conv0_w"], ["t0"],
         {"strides": [2, 2], "pads": [1, 1, 1, 1], "group": 1}),
        ("BatchNormalization",
         ["t0", "bn0_scale", "bn0_bias", "bn0_mean", "bn0_var"], ["t1"],
         {"epsilon": eps}),
        ("PRelu", ["t1", "prelu0_a"], ["t2"], {}),
        ("Conv", ["t2", "dw_w"], ["t3"],
         {"strides": [1, 1], "pads": [1, 1, 1, 1], "group": C1}),
        ("BatchNormalization",
         ["t3", "bn1_scale", "bn1_bias", "bn1_mean", "bn1_var"], ["t4"],
         {"epsilon": eps}),
        ("PRelu", ["t4", "prelu1_a"], ["t5"], {}),
        ("Conv", ["t5", "pw_w"], ["t6"], {"strides": [1, 1]}),
        ("BatchNormalization",
         ["t6", "bn2_scale", "bn2_bias", "bn2_mean", "bn2_var"], ["t7"],
         {"epsilon": eps}),
        ("Add", ["t7", "t2"], ["t8"], {}),
        ("AveragePool", ["t8"], ["t9"],
         {"kernel_shape": [2, 2], "strides": [2, 2], "ceil_mode": 1}),
        ("Flatten", ["t9"], ["t10"], {"axis": 1}),
        ("Gemm", ["t10", "fc_w", "fc_b"], ["out"],
         {"alpha": 1.0, "beta": 1.0, "transB": 0}),
    ]
    return inits, nodes


class TestGraphRunnerParity:
    def test_mobile_graph_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        inits, nodes = build_mobile_graph(rng)
        W = {k: torch.from_numpy(v) for k, v in inits}

        x = rng.standard_normal((2, 3, 11, 11)).astype(np.float32)
        xt = torch.from_numpy(x)
        eps = 1e-3

        def bn(t, p):
            return F.batch_norm(t, W[p + "_mean"], W[p + "_var"],
                                W[p + "_scale"], W[p + "_bias"], eps=eps)

        def prelu(t, p):
            return F.prelu(t, W[p].reshape(-1))

        with torch.no_grad():
            t = F.conv2d(xt, W["conv0_w"], stride=2, padding=1)
            t2 = prelu(bn(t, "bn0"), "prelu0_a")
            t = F.conv2d(t2, W["dw_w"], stride=1, padding=1, groups=6)
            t = prelu(bn(t, "bn1"), "prelu1_a")
            t = F.conv2d(t, W["pw_w"])
            t = bn(t, "bn2") + t2
            t = F.avg_pool2d(t, 2, 2, ceil_mode=True)
            want = (t.flatten(1) @ W["fc_w"] + W["fc_b"]).numpy()

        from facet_tpu.models.onnx_exec import GraphRunner

        runner = GraphRunner(inits, nodes, input_name="x",
                             output_names=["out"])
        got = np.asarray(runner(x)[0])
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_maxpool_global_pool_and_activations(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        w0 = rng.standard_normal((4, 3, 3, 3)).astype(np.float32) * 0.3
        inits = [("w0", w0)]
        nodes = [
            ("Conv", ["x", "w0"], ["a"], {"pads": [1, 1, 1, 1]}),
            ("LeakyRelu", ["a"], ["b"], {"alpha": 0.1}),
            ("MaxPool", ["b"], ["c"],
             {"kernel_shape": [3, 3], "strides": [2, 2],
              "pads": [1, 1, 1, 1]}),
            ("Sigmoid", ["c"], ["d"], {}),
            ("GlobalAveragePool", ["d"], ["e"], {}),
            ("Flatten", ["e"], ["out"], {"axis": 1}),
        ]
        x = rng.standard_normal((2, 3, 10, 10)).astype(np.float32)
        with torch.no_grad():
            t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w0), padding=1)
            t = F.leaky_relu(t, 0.1)
            t = F.max_pool2d(t, 3, 2, padding=1)
            t = torch.sigmoid(t)
            want = t.mean(dim=(2, 3)).numpy()

        from facet_tpu.models.onnx_exec import GraphRunner

        runner = GraphRunner(inits, nodes, input_name="x",
                             output_names=["out"])
        np.testing.assert_allclose(np.asarray(runner(x)[0]), want,
                                   atol=1e-5, rtol=1e-4)

    def test_reshape_slice_concat_static_int_tensors(self):
        """Integer initializers (shape/axes tensors) must be readable at
        trace time by Reshape/Slice."""
        rng = np.random.default_rng(2)
        inits = [
            ("shape", np.array([0, -1], np.int64)),
            ("starts", np.array([0], np.int64)),
            ("ends", np.array([2], np.int64)),
            ("axes", np.array([1], np.int64)),
        ]
        nodes = [
            ("Slice", ["x", "starts", "ends", "axes"], ["s"], {}),
            ("Reshape", ["s", "shape"], ["r"], {}),
            ("Concat", ["r", "r"], ["out"], {"axis": 1}),
        ]
        from facet_tpu.models.onnx_exec import GraphRunner

        x = rng.standard_normal((3, 4, 2)).astype(np.float32)
        runner = GraphRunner(inits, nodes, input_name="x",
                             output_names=["out"])
        want = np.concatenate([x[:, :2].reshape(3, -1)] * 2, axis=1)
        np.testing.assert_allclose(np.asarray(runner(x)[0]), want, rtol=1e-6)

    def test_unsupported_op_raises_upfront(self):
        from facet_tpu.models.onnx_exec import GraphRunner

        with pytest.raises(NotImplementedError, match="LSTM"):
            GraphRunner([], [("LSTM", ["x"], ["y"], {})], input_name="x")


class TestSerialization:
    def test_save_load_round_trip(self, tmp_path):
        rng = np.random.default_rng(3)
        inits, nodes = build_mobile_graph(rng)
        x = rng.standard_normal((1, 3, 11, 11)).astype(np.float32)

        from facet_tpu.models.onnx_exec import (
            GraphRunner,
            load_graph,
            save_graph,
        )

        runner = GraphRunner(inits, nodes, input_name="x",
                             output_names=["out"])
        want = np.asarray(runner(x)[0])

        path = tmp_path / "graph.npz"
        save_graph(path, inits, nodes, input_name="x", output_names=["out"])
        loaded = load_graph(path)
        np.testing.assert_allclose(np.asarray(loaded(x)[0]), want, rtol=1e-6)


class TestLandmarkGraphPath:
    def test_pipeline_uses_serialized_graph(self, tmp_path, monkeypatch):
        """A serialized 2d106det-style graph under the pretrained dir takes
        over landmark regression (raw-RGB NCHW in, (x+1)*96 out)."""
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.default_rng(4)
        # tiny stand-in graph: GlobalAveragePool -> Flatten -> Gemm(3->212)
        inits = [("fc_w", rng.standard_normal((3, 212)).astype(np.float32)
                  * 0.01), ("fc_b", rng.standard_normal(212).astype(
                      np.float32) * 0.01)]
        nodes = [("GlobalAveragePool", ["data"], ["g"], {}),
                 ("Flatten", ["g"], ["f"], {"axis": 1}),
                 ("Gemm", ["f", "fc_w", "fc_b"], ["fc1"], {})]
        from facet_tpu.models.onnx_exec import save_graph

        save_graph(tmp_path / "landmark_106_graph.npz", inits, nodes,
                   input_name="data", output_names=["fc1"])

        import facet_tpu.models.checkpoints as ckpt

        monkeypatch.setattr(ckpt, "PRETRAINED_DIR", str(tmp_path))
        graph = ckpt.load_landmark_graph()
        assert graph is not None

        crops = rng.integers(0, 256, (2, 192, 192, 3)).astype(np.uint8)
        x = crops.astype(np.float32).transpose(0, 3, 1, 2)
        want = (np.asarray(graph(x)[0]).reshape(-1, 106, 2) + 1.0) * 96.0

        class Dummy:
            _landmark_graph = graph

        from facet_tpu.models.face_pipeline import FacePipeline

        got = FacePipeline._run_landmarks(Dummy(), crops)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert got.shape == (2, 106, 2)

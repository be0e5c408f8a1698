"""Unit tests for the ONNX-independent logic in tools/convert_insightface.py."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from convert_insightface import assign_by_order, build_manifest  # noqa: E402


class TestAssignByOrder:
    def test_exact_sequence_assigns_all(self):
        manifest = [{"name": f"w{i}", "shape": s, "op": "Conv"}
                    for i, s in enumerate([(3, 3, 3, 16), (16,), (3, 3, 16, 32)])]
        slots = [("a/kernel", (3, 3, 3, 16)), ("a/bias", (16,)),
                 ("b/kernel", (3, 3, 16, 32))]
        assignments, mismatches = assign_by_order(manifest, slots)
        assert assignments == {"a/kernel": "w0", "a/bias": "w1",
                               "b/kernel": "w2"}
        assert mismatches == []

    def test_shape_mismatch_reported_with_candidates(self):
        manifest = [{"name": "w0", "shape": (3, 3, 3, 16), "op": "Conv"}]
        slots = [("a/kernel", (5, 5, 3, 16))]
        assignments, mismatches = assign_by_order(manifest, slots)
        assert assignments == {}
        assert mismatches[0][0] == "a/kernel"
        assert (3, 3, 3, 16) in mismatches[0][2]

    def test_order_preserved_never_rewinds(self):
        # two identical shapes: each slot takes the NEXT one in graph order
        manifest = [{"name": f"w{i}", "shape": (8,), "op": "BN"}
                    for i in range(3)]
        slots = [("x", (8,)), ("y", (8,))]
        assignments, _ = assign_by_order(manifest, slots)
        assert assignments == {"x": "w0", "y": "w1"}


class TestManifest:
    def test_consumer_resolution(self):
        import numpy as np

        inits = [("conv_w", np.zeros((16, 3, 3, 3), np.float32)),
                 ("bn_scale", np.ones(16, np.float32))]
        nodes = [("Conv", ["input", "conv_w"]),
                 ("BatchNormalization", ["conv_out", "bn_scale"])]
        manifest = build_manifest(inits, nodes)
        assert manifest[0]["op"] == "Conv"
        assert manifest[1]["op"] == "BatchNormalization"
        assert manifest[0]["shape"] == [16, 3, 3, 3]

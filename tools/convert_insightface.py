#!/usr/bin/env python3
"""Convert insightface buffalo_l ONNX models into facet_tpu .npz trees.

buffalo_l ships ONNX-only (det_10g.onnx, 2d106det.onnx, w600k_r50.onnx).
Uses the `onnx` package when installed, else the dependency-free wire
parser in facet_tpu/models/onnx_pb.py — the CLI runs end-to-end either
way (drilled by tests/test_pretrained_drill.py with synthesized
published-format ONNX files).

Strategy per model:

- w600k_r50 (ArcFace): prefer the torch backbone via
  tools/convert_checkpoints.py convert_arcface (exact, tested). This script
  can also read the ONNX directly: its initializers follow the torch export
  naming (conv1.weight, layer1.0.bn1.*, fc.weight ...), so the same key map
  applies after stripping the exporter prefix.

- det_10g (SCRFD): exact transcription in facet_tpu/models/scrfd.py. The
  torch->ONNX export preserves the mmdet state-dict names as initializer
  names, so conversion is name-mapped (models/scrfd.convert_scrfd) with a
  config inferred from the graph (infer_scrfd_config) — variants other
  than 10G reconstruct automatically. Self-diagnosing: every unconsumed /
  missing key is printed.

- 2d106det (landmarks): MXNet-exported graph; run with --manifest to dump
  every initializer (name, shape, op context, conv attributes) to JSON,
  then assign_by_order maps weights by shape in graph order, reporting
  every mismatch position instead of failing silently.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_onnx_initializers(path):
    """-> ordered [(name, array)] + [(op_type, [ins], [outs], {attrs})].

    Constant nodes are folded into the initializer list so GraphRunner
    (facet_tpu/models/onnx_exec.py) sees a pure dataflow graph.

    Prefers the `onnx` package when installed; otherwise falls back to
    the in-repo wire-format parser (facet_tpu/models/onnx_pb.py), which
    returns the identical structure — the CLI works either way."""
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        from facet_tpu.models.onnx_pb import load_model

        return load_model(path)

    model = onnx.load(path)
    graph = model.graph
    inits = [(t.name, numpy_helper.to_array(t)) for t in graph.initializer]
    nodes = []
    for n in graph.node:
        attrs = {}
        for a in n.attribute:
            if a.type == onnx.AttributeProto.INTS:
                attrs[a.name] = list(a.ints)
            elif a.type == onnx.AttributeProto.INT:
                attrs[a.name] = a.i
            elif a.type == onnx.AttributeProto.FLOAT:
                attrs[a.name] = a.f
            elif a.type == onnx.AttributeProto.STRING:
                attrs[a.name] = a.s.decode()
            elif a.type == onnx.AttributeProto.TENSOR:
                attrs[a.name] = numpy_helper.to_array(a.t)
        if n.op_type == "Constant":
            inits.append((n.output[0], attrs.get("value")))
            continue
        nodes.append((n.op_type, list(n.input), list(n.output), attrs))
    return inits, nodes


def build_manifest(inits, nodes):
    """Initializer manifest: which op consumes each tensor (with conv
    strides/group attributes), in graph order."""
    consumer = {}
    for node in nodes:
        op_type, inputs = node[0], node[1]
        attrs = node[3] if len(node) > 3 else {}
        for name in inputs:
            consumer.setdefault(name, (op_type, attrs))
    out = []
    for name, arr in inits:
        op, attrs = consumer.get(name, ("?", {}))
        entry = {"name": name, "shape": list(arr.shape),
                 "dtype": str(arr.dtype), "op": op}
        if op == "Conv" and attrs:
            entry["strides"] = attrs.get("strides")
            entry["group"] = attrs.get("group", 1)
        out.append(entry)
    return out


def assign_by_order(manifest, slots):
    """Greedy order-preserving assignment of graph weights onto module slots.

    manifest: [{'name', 'shape', 'op'}] in graph order (Conv weights only
    make sense against conv kernels etc. — callers pre-filter by op).
    slots: ordered [(path, shape)] from the flax module (flattened tree).

    Returns (assignments {path: name}, mismatches [(path, shape, candidates)]).
    Pure function: unit-testable without onnx.
    """
    assignments, mismatches = {}, []
    cursor = 0
    for path, shape in slots:
        found = None
        for idx in range(cursor, len(manifest)):
            if tuple(manifest[idx]["shape"]) == tuple(shape):
                found = idx
                break
        if found is None:
            mismatches.append((path, tuple(shape),
                               [tuple(m["shape"]) for m in
                                manifest[cursor:cursor + 3]]))
        else:
            assignments[path] = manifest[found]["name"]
            cursor = found + 1
    return assignments, mismatches


def convert_arcface_onnx(path, out_dir):
    """w600k_r50.onnx -> arcface_iresnet50.npz via the torch-name key map."""
    from facet_tpu.models.convert import convert_arcface_iresnet50, save_params

    inits, _ = load_onnx_initializers(path)
    sd = {}
    for name, arr in inits:
        # ONNX exporters keep torch names, sometimes under a module prefix
        key = name.split("::")[-1]
        for prefix in ("backbone.", "module."):
            key = key.removeprefix(prefix)
        sd[key] = np.asarray(arr)
    # exported BN folds running stats into the BatchNormalization node's
    # inputs with the same dotted names, so the torch map applies directly
    tree = convert_arcface_iresnet50(sd)
    save_params(tree, os.path.join(out_dir, "arcface_iresnet50.npz"))
    print("converted arcface_iresnet50 from ONNX")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("model", help="path to det_10g.onnx / 2d106det.onnx"
                                      " / w600k_r50.onnx")
    parser.add_argument("--out", default="pretrained_models")
    parser.add_argument("--manifest", action="store_true",
                        help="dump initializer manifest JSON and exit")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    inits, nodes = load_onnx_initializers(args.model)
    manifest = build_manifest(inits, nodes)
    base = os.path.splitext(os.path.basename(args.model))[0]

    if args.manifest:
        out = os.path.join(args.out, f"{base}_manifest.json")
        with open(out, "w") as fh:
            json.dump(manifest, fh, indent=1)
        print(f"wrote {out} ({len(manifest)} initializers) — transcribe the"
              " exact architecture from it (docs/CONVERTERS.md)")
        return 0

    if "w600k" in base or "arcface" in base:
        convert_arcface_onnx(args.model, args.out)
        return 0

    if "det_" in base or "scrfd" in base.lower():
        from facet_tpu.models.convert import save_params
        from facet_tpu.models.scrfd import convert_scrfd, infer_scrfd_config

        cfg = infer_scrfd_config(manifest)
        print(f"inferred SCRFD config: stem {cfg.stem_channels}/"
              f"{cfg.base_channels}, blocks {cfg.stage_blocks}, planes"
              f" {cfg.stage_planes}, neck {cfg.neck_channels}, head"
              f" {cfg.feat_channels}x{cfg.stacked_convs}")
        tree, report = convert_scrfd(dict(inits), cfg)
        if report["missing"]:
            print(f"WARNING: {len(report['missing'])} module params kept"
                  " init values — check the report above")
        save_params(tree, os.path.join(args.out, "scrfd_detector.npz"))
        print("converted scrfd_detector from ONNX")
        return 0

    # 2d106det and any other small ONNX model: serialize the graph itself
    # and execute it exactly (facet_tpu/models/onnx_exec.py)
    from facet_tpu.models.onnx_exec import GraphRunner, save_graph

    name = "landmark_106_graph" if "106" in base else f"{base}_graph"
    try:
        GraphRunner(inits, nodes)      # validates the op set up front
    except (NotImplementedError, ValueError) as exc:
        print(f"{base}: cannot execute this graph ({exc}) — run with"
              " --manifest and follow docs/CONVERTERS.md")
        return 1
    out = os.path.join(args.out, f"{name}.npz")
    save_graph(out, inits, nodes)
    print(f"serialized {base} -> {out} ({len(inits)} tensors,"
          f" {len(nodes)} nodes); executes via GraphRunner")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Minimal ONNX graph executor on JAX/XLA.

Why: buffalo_l's 2d106det landmark model ships as an MXNet-exported ONNX
graph with no published torch source (reference loads it through
onnxruntime, analyzers/face.py:29-39). Rather than transcribe its
architecture from memory, this executes the graph itself: topology AND
weights come from the file, so numeric parity is by construction. The op
set covers the mobile-CNN vocabulary those exports use (Conv incl.
depthwise, BatchNormalization, PRelu/Relu/LeakyRelu, pooling, Gemm/MatMul,
Flatten/Reshape/Concat, residual Adds, Sigmoid, nearest Resize/Upsample).

The whole graph runs as ONE jitted XLA program: tensors stay NCHW (ONNX
semantics; XLA lays them out for the TPU anyway), weights are a flat list
pytree so the program re-traces only per input shape. No onnxruntime, no
onnx package at runtime — the loader in tools/convert_insightface.py dumps
(initializers, nodes) once, and the serialized graph is stored as a .npz
checkpoint (facet_tpu/models/convert.py save_graph/load_graph).

Also doubles as an offline cross-check for the transcribed SCRFD
(models/scrfd.py): running det_10g.onnx through this executor and through
the transcription must agree.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np


def _attr(attrs, name, default=None):
    return attrs.get(name, default)


def _conv(x, w, b, attrs):
    strides = tuple(_attr(attrs, "strides", [1, 1]))
    dil = tuple(_attr(attrs, "dilations", [1, 1]))
    group = int(_attr(attrs, "group", 1))
    pads = _attr(attrs, "pads")
    auto = _attr(attrs, "auto_pad")
    if pads is not None and any(pads):
        # ONNX pads = [top, left, bottom, right]
        padding = ((pads[0], pads[2]), (pads[1], pads[3]))
    elif isinstance(auto, (bytes, str)) and b"SAME" in (
            auto if isinstance(auto, bytes) else auto.encode()):
        padding = "SAME"
    else:
        padding = ((0, 0), (0, 0))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding, rhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _pool(x, attrs, op):
    kind = "max" if op == "MaxPool" else "avg"
    k = tuple(_attr(attrs, "kernel_shape", [2, 2]))
    strides = tuple(_attr(attrs, "strides", k))
    pads = _attr(attrs, "pads", [0, 0, 0, 0])
    ceil = bool(_attr(attrs, "ceil_mode", 0))
    cip = bool(_attr(attrs, "count_include_pad", 0))
    pt, pl, pb, pr = pads
    h, w = x.shape[2:]
    if ceil:
        # extend right/bottom padding so the last window fits
        pb += (-(h + pt + pb - k[0]) % strides[0])
        pr += (-(w + pl + pr - k[1]) % strides[1])
    window = (1, 1) + k
    stride4 = (1, 1) + strides
    pad4 = ((0, 0), (0, 0), (pt, pb), (pl, pr))
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, stride4, pad4)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, stride4, pad4)
    if cip:
        return s / float(k[0] * k[1])
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, stride4,
                                   pad4)
    return s / counts


def _resize_nearest(x, out_h, out_w):
    h, w = x.shape[2:]
    ri = (jnp.arange(out_h) * h) // out_h
    ci = (jnp.arange(out_w) * w) // out_w
    return x[:, :, ri][:, :, :, ci]


def _gemm(x, w, b, attrs):
    if _attr(attrs, "transA", 0):
        x = x.T
    if _attr(attrs, "transB", 0):
        w = w.T
    alpha = float(_attr(attrs, "alpha", 1.0))
    beta = float(_attr(attrs, "beta", 1.0))
    out = alpha * (x @ w)
    if b is not None:
        out = out + beta * b
    return out


class GraphRunner:
    """Executes a (initializers, nodes) ONNX graph as one jitted program.

    inits: ordered [(name, np.ndarray)]
    nodes: [(op_type, [input names], [output names], {attrs})]
    """

    SUPPORTED = {
        "Conv", "BatchNormalization", "Relu", "PRelu", "LeakyRelu",
        "Sigmoid", "Softmax", "Add", "Sub", "Mul", "Div", "MaxPool",
        "AveragePool", "GlobalAveragePool", "Gemm", "MatMul", "Flatten",
        "Reshape", "Concat", "Transpose", "Dropout", "Identity", "Clip",
        "Resize", "Upsample", "Shape", "Gather", "Unsqueeze", "Exp",
        "Slice", "Squeeze", "ReduceMean", "Tanh",
    }

    def __init__(self, inits, nodes, input_name=None, output_names=None):
        self.weights = {name: np.asarray(arr) for name, arr in inits}
        self.nodes = [tuple(n) for n in nodes]
        unsupported = sorted({n[0] for n in self.nodes}
                             - self.SUPPORTED)
        if unsupported:
            raise NotImplementedError(
                f"ONNX ops not supported by GraphRunner: {unsupported}")
        produced = {o for n in self.nodes for o in n[2]}
        consumed = {i for n in self.nodes for i in n[1]}
        graph_inputs = sorted(consumed - produced - set(self.weights))
        if input_name is None:
            if len(graph_inputs) != 1:
                raise ValueError(f"ambiguous graph inputs: {graph_inputs}")
            input_name = graph_inputs[0]
        self.input_name = input_name
        self.output_names = output_names or sorted(produced - consumed)
        # integer tensors (shapes, axes, indices) stay static numpy so ops
        # like Reshape/Slice can read them at trace time; float weights are
        # traced arguments (one program, weights swappable)
        self._static = {n: a for n, a in self.weights.items()
                        if not np.issubdtype(a.dtype, np.floating)}
        self._weight_names = [n for n in (name for name, _ in inits)
                              if n not in self._static]
        self._jitted = jax.jit(self._run)

    # ------------------------------------------------------------------ exec

    def _run(self, weight_list, x):
        env = dict(self._static)
        env.update(zip(self._weight_names, weight_list))
        env[self.input_name] = x

        def get(name):
            return env[name]

        for op, ins, outs, attrs in self.nodes:
            a = [get(i) if i else None for i in ins]
            if op == "Conv":
                r = _conv(a[0], a[1], a[2] if len(a) > 2 else None, attrs)
            elif op == "BatchNormalization":
                eps = float(_attr(attrs, "epsilon", 1e-5))
                scale, bias, mean, var = a[1], a[2], a[3], a[4]
                shape = (1, -1) + (1,) * (a[0].ndim - 2)
                r = (a[0] - mean.reshape(shape)) * (
                    scale.reshape(shape)
                    * jax.lax.rsqrt(var.reshape(shape) + eps)) \
                    + bias.reshape(shape)
            elif op == "Relu":
                r = jax.nn.relu(a[0])
            elif op == "PRelu":
                alpha = a[1].reshape((1, -1) + (1,) * (a[0].ndim - 2)) \
                    if a[1].ndim > 0 and a[0].ndim > 2 else a[1]
                r = jnp.where(a[0] >= 0, a[0], alpha * a[0])
            elif op == "LeakyRelu":
                alpha = float(_attr(attrs, "alpha", 0.01))
                r = jnp.where(a[0] >= 0, a[0], alpha * a[0])
            elif op == "Sigmoid":
                r = jax.nn.sigmoid(a[0])
            elif op == "Softmax":
                r = jax.nn.softmax(a[0], axis=int(_attr(attrs, "axis", -1)))
            elif op == "Tanh":
                r = jnp.tanh(a[0])
            elif op == "Exp":
                r = jnp.exp(a[0])
            elif op in ("Add", "Sub", "Mul", "Div"):
                fn = {"Add": jnp.add, "Sub": jnp.subtract,
                      "Mul": jnp.multiply, "Div": jnp.divide}[op]
                r = fn(a[0], a[1])
            elif op in ("MaxPool", "AveragePool"):
                r = _pool(a[0], attrs, op)
            elif op == "GlobalAveragePool":
                r = jnp.mean(a[0], axis=(2, 3), keepdims=True)
            elif op == "ReduceMean":
                axes = tuple(_attr(attrs, "axes", [1]))
                r = jnp.mean(a[0], axis=axes,
                             keepdims=bool(_attr(attrs, "keepdims", 1)))
            elif op == "Gemm":
                r = _gemm(a[0], a[1], a[2] if len(a) > 2 else None, attrs)
            elif op == "MatMul":
                r = a[0] @ a[1]
            elif op == "Flatten":
                ax = int(_attr(attrs, "axis", 1))
                r = a[0].reshape(
                    int(np.prod(a[0].shape[:ax])) if ax else 1, -1)
            elif op == "Reshape":
                shape = [int(s) for s in np.asarray(a[1])]
                shape = [a[0].shape[i] if s == 0 else s
                         for i, s in enumerate(shape)]
                r = a[0].reshape(shape)
            elif op == "Concat":
                r = jnp.concatenate(
                    [t for t in a], axis=int(_attr(attrs, "axis", 1)))
            elif op == "Transpose":
                r = jnp.transpose(a[0], _attr(attrs, "perm"))
            elif op in ("Dropout", "Identity"):
                r = a[0]
            elif op == "Clip":
                lo = a[1] if len(a) > 1 and a[1] is not None else _attr(
                    attrs, "min", -np.inf)
                hi = a[2] if len(a) > 2 and a[2] is not None else _attr(
                    attrs, "max", np.inf)
                r = jnp.clip(a[0], lo, hi)
            elif op in ("Resize", "Upsample"):
                # nearest only; scales input (Upsample/Resize-10) or sizes
                if op == "Upsample" or len(ins) == 2:
                    scales = np.asarray(a[-1])
                    out_h = int(a[0].shape[2] * float(scales[2]))
                    out_w = int(a[0].shape[3] * float(scales[3]))
                else:   # Resize-11+: roi, scales, sizes
                    sizes = a[3] if len(a) > 3 else None
                    if sizes is not None:
                        out_h, out_w = int(sizes[2]), int(sizes[3])
                    else:
                        scales = np.asarray(a[2])
                        out_h = int(a[0].shape[2] * float(scales[2]))
                        out_w = int(a[0].shape[3] * float(scales[3]))
                r = _resize_nearest(a[0], out_h, out_w)
            elif op == "Shape":
                r = np.asarray(a[0].shape, np.int64)
            elif op == "Gather":
                r = jnp.take(a[0], np.asarray(a[1]),
                             axis=int(_attr(attrs, "axis", 0)))
            elif op == "Unsqueeze":
                axes = _attr(attrs, "axes", [0])
                r = a[0]
                for ax in sorted(axes):
                    r = jnp.expand_dims(r, ax)
            elif op == "Squeeze":
                axes = _attr(attrs, "axes")
                r = jnp.squeeze(a[0], axis=tuple(axes) if axes else None)
            elif op == "Slice":
                starts, ends = np.asarray(a[1]), np.asarray(a[2])
                axes = (np.asarray(a[3]) if len(a) > 3 and a[3] is not None
                        else np.arange(len(starts)))
                steps = (np.asarray(a[4]) if len(a) > 4 and a[4] is not None
                         else np.ones(len(starts), np.int64))
                sl = [slice(None)] * a[0].ndim
                for s, e, ax, st in zip(starts, ends, axes, steps):
                    sl[int(ax)] = slice(int(s), int(e), int(st))
                r = a[0][tuple(sl)]
            else:       # pragma: no cover — guarded in __init__
                raise NotImplementedError(op)
            outs_r = r if isinstance(r, tuple) else (r,)
            for name, val in zip(outs, outs_r):
                env[name] = val
        return [env[name] for name in self.output_names]

    def __call__(self, x):
        """x: NCHW float32 numpy/jax array -> list of output arrays."""
        weight_list = [jnp.asarray(self.weights[n])
                       for n in self._weight_names]
        return self._jitted(weight_list, jnp.asarray(x))


# ---------------------------------------------------------------------------
# Serialization: graph -> npz (no onnx dependency at runtime)
# ---------------------------------------------------------------------------


def save_graph(path, inits, nodes, input_name=None, output_names=None):
    """Store an ONNX graph (weights + topology) as one .npz file."""
    meta = {"nodes": [[op, list(ins), list(outs),
                       {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                        for k, v in attrs.items()}]
                      for op, ins, outs, attrs in nodes],
            "weight_names": [name for name, _ in inits],
            "input_name": input_name,
            "output_names": output_names}
    arrays = {f"w{i}": np.asarray(arr) for i, (_, arr) in enumerate(inits)}
    arrays["__graph__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_graph(path):
    """-> GraphRunner from a save_graph() file."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__graph__"]).decode())
    inits = [(name, data[f"w{i}"])
             for i, name in enumerate(meta["weight_names"])]
    nodes = [(op, ins, outs, attrs)
             for op, ins, outs, attrs in meta["nodes"]]
    return GraphRunner(inits, nodes, meta.get("input_name"),
                       meta.get("output_names"))

"""Minimal ONNX protobuf WRITER for tests (no `onnx` package needed).

Produces valid ModelProto wire bytes from (initializers, nodes) so the
drill tests can synthesize det_10g.onnx / 2d106det.onnx / w600k_r50.onnx
in the published format and run tools/convert_insightface.py end-to-end.
Field numbers mirror facet_tpu/models/onnx_pb.py (the reader).
"""

import struct

import numpy as np

_NP_TO_ONNX = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.int32): 6, np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10, np.dtype(np.float64): 11,
}


def _varint(v):
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _len_field(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field, v):
    return _tag(field, 0) + _varint(v)


def _str_field(field, s):
    return _len_field(field, s.encode("utf-8"))


def tensor_proto(name, arr):
    arr = np.asarray(arr)
    if arr.ndim:        # ascontiguousarray would promote 0-d to (1,)
        arr = np.ascontiguousarray(arr)
    dt = _NP_TO_ONNX[arr.dtype]
    out = b""
    # dims=1 packed
    if arr.ndim:
        dims = b"".join(_varint(d) for d in arr.shape)
        out += _len_field(1, dims)
    out += _varint_field(2, dt)                      # data_type
    out += _str_field(8, name)                       # name
    out += _len_field(9, arr.tobytes())              # raw_data
    return out


def attribute_proto(name, value):
    out = _str_field(1, name)
    if isinstance(value, bool):
        value = int(value)
    if isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            out += _len_field(7, b"".join(struct.pack("<f", v)
                                          for v in value))
            out += _varint_field(20, 6)              # FLOATS
        else:
            out += _len_field(8, b"".join(_varint(int(v)) for v in value))
            out += _varint_field(20, 7)              # INTS
    elif isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value)
        out += _varint_field(20, 1)                  # FLOAT
    elif isinstance(value, int):
        out += _varint_field(3, value)
        out += _varint_field(20, 2)                  # INT
    elif isinstance(value, str):
        out += _len_field(4, value.encode())
        out += _varint_field(20, 3)                  # STRING
    elif isinstance(value, np.ndarray):
        out += _len_field(5, tensor_proto("", value))
        out += _varint_field(20, 4)                  # TENSOR
    else:
        raise TypeError(f"attribute {name}: {type(value)}")
    return out


def node_proto(op_type, inputs, outputs, attrs=None):
    out = b""
    for i in inputs:
        out += _str_field(1, i)
    for o in outputs:
        out += _str_field(2, o)
    out += _str_field(4, op_type)
    for k, v in (attrs or {}).items():
        out += _len_field(5, attribute_proto(k, v))
    return out


def build_model(initializers, nodes, graph_name="g"):
    """-> ONNX ModelProto bytes.

    initializers: [(name, np.ndarray)]
    nodes: [(op_type, [inputs], [outputs], {attrs})]
    """
    graph = b""
    for op_type, inputs, outputs, attrs in nodes:
        graph += _len_field(1, node_proto(op_type, inputs, outputs, attrs))
    graph += _str_field(2, graph_name)
    for name, arr in initializers:
        graph += _len_field(5, tensor_proto(name, arr))
    model = _varint_field(1, 8)                      # ir_version
    model += _str_field(2, "facet-test-writer")      # producer_name
    # opset_import: {domain:"", version:13}
    model += _len_field(8, _str_field(1, "") + _varint_field(2, 13))
    model += _len_field(7, graph)
    return model


def write_model(path, initializers, nodes, graph_name="g"):
    with open(path, "wb") as fh:
        fh.write(build_model(initializers, nodes, graph_name))
    return path

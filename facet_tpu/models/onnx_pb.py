"""Dependency-free ONNX model reader (protobuf wire-format parser).

The insightface buffalo_l models ship ONNX-only (det_10g.onnx,
2d106det.onnx, w600k_r50.onnx — reference analyzers/face.py:29-39 loads
them through onnxruntime), but neither `onnx` nor `onnxruntime` is
installable in every deployment. This module parses the ONNX ModelProto
wire format directly — the stable proto3 subset the converters need:
graph initializers, nodes (op_type/inputs/outputs/attributes), and
Constant folding. Output format matches
tools/convert_insightface.load_onnx_initializers exactly, so the
converter CLI works with or without the onnx package.

Wire format facts used (proto3): tag = (field << 3) | wire_type; wire
types 0 = varint, 1 = 64-bit, 2 = length-delimited, 5 = 32-bit. Field
numbers below are fixed by onnx.proto (stable since IR v3):

  ModelProto:   graph=7
  GraphProto:   node=1, initializer=5
  NodeProto:    input=1, output=2, name=3, op_type=4, attribute=5
  AttributeProto: name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20
  TensorProto:  dims=1, data_type=2, float_data=4, int32_data=5,
                string_data=6, int64_data=7, name=8, raw_data=9,
                double_data=10, uint64_data=11
"""

import struct

import numpy as np

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


class ONNXParseError(ValueError):
    pass


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ONNXParseError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ONNXParseError("varint too long")


def _to_signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_message(buf):
    """Generic proto parse -> {field_number: [raw values]}.

    varint fields come back as unsigned ints, 32/64-bit as raw bytes,
    length-delimited as bytes (caller interprets per schema).
    """
    fields = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            if pos + length > n:
                raise ONNXParseError("truncated length-delimited field")
            val, pos = buf[pos:pos + length], pos + length
        elif wire == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ONNXParseError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def _packed_varints(chunks):
    """Repeated varint field: proto3 packs into one length-delimited blob,
    but unpacked encodings (one varint per entry) must parse too."""
    out = []
    for chunk in chunks:
        if isinstance(chunk, int):
            out.append(_to_signed64(chunk))
        else:
            pos = 0
            while pos < len(chunk):
                v, pos = _read_varint(chunk, pos)
                out.append(_to_signed64(v))
    return out


def _packed_fixed(chunks, fmt, size):
    out = []
    for chunk in chunks:
        if isinstance(chunk, bytes) and len(chunk) == size:
            out.append(struct.unpack(fmt, chunk)[0])
        else:
            for i in range(0, len(chunk), size):
                out.append(struct.unpack(fmt, chunk[i:i + size])[0])
    return out


def parse_tensor(buf):
    """TensorProto bytes -> (name, numpy array)."""
    f = parse_message(buf)
    dims = _packed_varints(f.get(1, []))
    data_type = f.get(2, [1])[0]
    name = f.get(8, [b""])[0].decode("utf-8", "replace")
    dtype = _DTYPES.get(data_type)
    if dtype is None:
        raise ONNXParseError(f"tensor {name!r}: data_type {data_type}"
                             " unsupported")
    if 9 in f:  # raw_data
        arr = np.frombuffer(f[9][0], dtype=dtype)
    elif 4 in f and data_type == 1:  # float_data
        arr = np.asarray(_packed_fixed(f[4], "<f", 4), np.float32)
    elif 10 in f and data_type == 11:  # double_data
        arr = np.asarray(_packed_fixed(f[10], "<d", 8), np.float64)
    elif 7 in f and data_type == 7:  # int64_data
        arr = np.asarray(_packed_varints(f[7]), np.int64)
    elif 5 in f:  # int32_data (also carries int8/16/bool payloads)
        arr = np.asarray(_packed_varints(f[5]), np.int32).astype(dtype)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def parse_attribute(buf):
    """AttributeProto bytes -> (name, python value).

    Value interpretation follows the convert CLI contract:
    INTS -> list[int], INT -> int, FLOAT -> float, STRING -> str,
    TENSOR -> np.ndarray, FLOATS -> list[float].
    """
    f = parse_message(buf)
    name = f.get(1, [b""])[0].decode("utf-8", "replace")
    atype = f.get(20, [0])[0]
    if atype == 1 and 2 in f:  # FLOAT
        return name, struct.unpack("<f", f[2][0])[0]
    if atype == 2 and 3 in f:  # INT
        return name, _to_signed64(f[3][0])
    if atype == 3 and 4 in f:  # STRING
        return name, f[4][0].decode("utf-8", "replace")
    if atype == 4 and 5 in f:  # TENSOR
        return name, parse_tensor(f[5][0])[1]
    if atype == 6:  # FLOATS
        return name, _packed_fixed(f.get(7, []), "<f", 4)
    if atype == 7:  # INTS
        return name, _packed_varints(f.get(8, []))
    # untyped writers (type field omitted): infer from populated fields
    if 8 in f:
        return name, _packed_varints(f[8])
    if 3 in f:
        return name, _to_signed64(f[3][0])
    if 2 in f:
        return name, struct.unpack("<f", f[2][0])[0]
    if 5 in f:
        return name, parse_tensor(f[5][0])[1]
    if 4 in f:
        return name, f[4][0].decode("utf-8", "replace")
    return name, None


def parse_node(buf):
    """NodeProto bytes -> (op_type, [inputs], [outputs], {attrs})."""
    f = parse_message(buf)
    inputs = [b.decode("utf-8", "replace") for b in f.get(1, [])]
    outputs = [b.decode("utf-8", "replace") for b in f.get(2, [])]
    op_type = f.get(4, [b""])[0].decode("utf-8", "replace")
    attrs = dict(parse_attribute(b) for b in f.get(5, []))
    return op_type, inputs, outputs, attrs


def load_model(path):
    """ONNX file -> (initializers [(name, array)], nodes [(op_type, ins,
    outs, attrs)]) with Constant nodes folded into the initializers —
    byte-compatible with convert_insightface.load_onnx_initializers."""
    with open(path, "rb") as fh:
        buf = fh.read()
    model = parse_message(buf)
    graphs = model.get(7)
    if not graphs:
        raise ONNXParseError("no GraphProto in model (field 7 empty) — "
                             "not an ONNX file?")
    graph = parse_message(graphs[0])
    inits = [parse_tensor(b) for b in graph.get(5, [])]
    nodes = []
    for raw in graph.get(1, []):
        op_type, inputs, outputs, attrs = parse_node(raw)
        if op_type == "Constant":
            inits.append((outputs[0], attrs.get("value")))
            continue
        nodes.append((op_type, inputs, outputs, attrs))
    return inits, nodes

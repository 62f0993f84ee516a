"""Minimal ONNX loader + JAX executor (no ``onnx``/``onnxruntime`` deps).

The reference scores RLHF completions with DNSMOS
(/root/reference/tts/training/rlhf/rewards.py:166-204), whose published
weights exist only as ONNX graphs. This image has no onnx package (and zero
egress), so this module hand-parses the protobuf wire format of an ONNX
``ModelProto`` and executes the graph with jnp ops. The op set covers the
small Keras/torch-exported CNN/dense models used for perceptual scoring —
it is an interpreter for trusted local model files, not a general runtime.

Execution is jit-safe: "shape-like" host values (Shape outputs, initializer
int tensors feeding Reshape/Slice/...) are computed with concrete numpy
while device tensors flow through jnp, so ``jax.jit(lambda x: run(graph,
{"in": x}))`` traces to a single XLA program.

A tiny encoder (``build_model_bytes`` and friends) lets tests construct
valid ONNX files without the onnx package.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# --- protobuf wire-format primitives -----------------------------------------

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value). LEN values are bytes; varints
    are ints; I32/I64 are raw 4/8-byte chunks."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == _WIRE_VARINT:
            v, i = _read_varint(buf, i)
        elif wt == _WIRE_LEN:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == _WIRE_I64:
            v = buf[i : i + 8]
            i += 8
        elif wt == _WIRE_I32:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _signed(v: int) -> int:
    """Varints are two's-complement 64-bit for int64 fields."""
    return v - (1 << 64) if v >= 1 << 63 else v


def _packed_varints(v, wt) -> list[int]:
    if wt == _WIRE_VARINT:
        return [_signed(v)]
    out, i = [], 0
    while i < len(v):
        x, i = _read_varint(v, i)
        out.append(_signed(x))
    return out


# --- ONNX message parsing ------------------------------------------------------

# TensorProto.DataType
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype_code = 1
    raw = b""
    float_data: list[float] = []
    int32_data: list[int] = []
    int64_data: list[int] = []
    double_data: list[float] = []
    name = ""
    for fno, wt, v in _iter_fields(buf):
        if fno == 1:
            dims.extend(_packed_varints(v, wt))
        elif fno == 2:
            dtype_code = v
        elif fno == 4:
            if wt == _WIRE_I32:
                float_data.append(struct.unpack("<f", v)[0])
            else:
                float_data.extend(
                    struct.unpack(f"<{len(v) // 4}f", v)
                )
        elif fno == 5:
            int32_data.extend(_packed_varints(v, wt))
        elif fno == 7:
            int64_data.extend(_packed_varints(v, wt))
        elif fno == 8:
            name = v.decode()
        elif fno == 9:
            raw = v
        elif fno == 11:
            if wt == _WIRE_I64:
                double_data.append(struct.unpack("<d", v)[0])
            else:
                double_data.extend(struct.unpack(f"<{len(v) // 8}d", v))
    dtype = _DTYPES.get(dtype_code)
    if dtype is None:
        raise ValueError(f"unsupported tensor dtype code {dtype_code}")
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=dtype)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=dtype)
    elif int32_data:
        arr = np.asarray(int32_data, dtype=dtype)
    elif double_data:
        arr = np.asarray(double_data, dtype=dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    return name, arr.reshape(dims)


@dataclass
class Attribute:
    name: str = ""
    f: float | None = None
    i: int | None = None
    s: bytes | None = None
    t: np.ndarray | None = None
    floats: list[float] = field(default_factory=list)
    ints: list[int] = field(default_factory=list)

    @property
    def value(self):
        for v in (self.t, self.s, self.f, self.i):
            if v is not None:
                return v
        return self.ints or self.floats


def _parse_attribute(buf: bytes) -> Attribute:
    a = Attribute()
    for fno, wt, v in _iter_fields(buf):
        if fno == 1:
            a.name = v.decode()
        elif fno == 2:
            a.f = struct.unpack("<f", v)[0]
        elif fno == 3:
            a.i = _signed(v)
        elif fno == 4:
            a.s = v
        elif fno == 5:
            a.t = _parse_tensor(v)[1]
        elif fno == 6:
            if wt == _WIRE_I32:
                a.floats.append(struct.unpack("<f", v)[0])
            else:
                a.floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
        elif fno == 7:
            a.ints.extend(_packed_varints(v, wt))
    return a


@dataclass
class Node:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    name: str
    attrs: dict[str, Attribute]

    def attr(self, name: str, default=None):
        a = self.attrs.get(name)
        return default if a is None else a.value


def _parse_node(buf: bytes) -> Node:
    inputs, outputs, attrs = [], [], {}
    op_type = name = ""
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            inputs.append(v.decode())
        elif fno == 2:
            outputs.append(v.decode())
        elif fno == 3:
            name = v.decode()
        elif fno == 4:
            op_type = v.decode()
        elif fno == 5:
            a = _parse_attribute(v)
            attrs[a.name] = a
    return Node(op_type, inputs, outputs, name, attrs)


def _value_info_name(buf: bytes) -> str:
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            return v.decode()
    return ""


@dataclass
class Graph:
    nodes: list[Node]
    initializers: dict[str, np.ndarray]
    input_names: list[str]
    output_names: list[str]

    @property
    def feed_names(self) -> list[str]:
        """Graph inputs that are not initializer-backed (the real feeds)."""
        return [n for n in self.input_names if n not in self.initializers]


def _parse_graph(buf: bytes) -> Graph:
    nodes, inits, ins, outs = [], {}, [], []
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            nodes.append(_parse_node(v))
        elif fno == 5:
            name, arr = _parse_tensor(v)
            inits[name] = arr
        elif fno == 11:
            ins.append(_value_info_name(v))
        elif fno == 12:
            outs.append(_value_info_name(v))
    return Graph(nodes, inits, ins, outs)


def parse_model(data: bytes) -> Graph:
    """ONNX ModelProto bytes -> Graph."""
    for fno, _wt, v in _iter_fields(data):
        if fno == 7:
            return _parse_graph(v)
    raise ValueError("no graph in ONNX model")


def load_model(path: str) -> Graph:
    with open(path, "rb") as f:
        return parse_model(f.read())


# --- executor -------------------------------------------------------------------

# Host values (np.ndarray) carry concrete shape/index data; device values
# (jax arrays / tracers) carry tensors. An op whose inputs are all host
# values runs in numpy, keeping Shape->Reshape chains concrete under jit.


def _is_host(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, list, tuple))


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _explicit_pads(node: Node, x, kernel_shape, strides, dilations):
    """Resolve pads from the ``pads`` attr or ``auto_pad``; returns per-spatial
    (lo, hi) pairs."""
    nd = len(kernel_shape)
    auto = node.attr("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("NOTSET", ""):
        pads = node.attr("pads", [0] * (2 * nd))
        return [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
    if auto == "VALID":
        return [(0, 0)] * nd
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(nd):
        in_dim = x.shape[2 + i]
        eff_k = (kernel_shape[i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])  # ceil
        total = max(0, (out_dim - 1) * strides[i] + eff_k - in_dim)
        lo = total // 2 if auto == "SAME_UPPER" else (total + 1) // 2
        out.append((lo, total - lo))
    return out


def _op_conv(node: Node, x, w, b=None):
    nd = w.ndim - 2
    kernel_shape = [int(k) for k in node.attr("kernel_shape", list(w.shape[2:]))]
    strides = [int(s) for s in node.attr("strides", [1] * nd)]
    dilations = [int(d) for d in node.attr("dilations", [1] * nd)]
    group = int(node.attr("group", 1))
    pads = _explicit_pads(node, x, kernel_shape, strides, dilations)
    spatial = "DHW"[3 - nd :]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NC" + spatial, "OI" + spatial, "NC" + spatial),
    )
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=strides, padding=pads,
        rhs_dilation=dilations, dimension_numbers=dn, feature_group_count=group,
    )
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return y


def _pool(node: Node, x, reducer, init, is_avg):
    kernel_shape = [int(k) for k in node.attr("kernel_shape")]
    nd = len(kernel_shape)
    strides = [int(s) for s in node.attr("strides", [1] * nd)]
    pads = _explicit_pads(node, x, kernel_shape, strides, [1] * nd)
    dims = (1, 1) + tuple(kernel_shape)
    strd = (1, 1) + tuple(strides)
    pad = ((0, 0), (0, 0)) + tuple(pads)
    y = jax.lax.reduce_window(jnp.asarray(x), init, reducer, dims, strd, pad)
    if is_avg:
        if int(node.attr("count_include_pad", 0)) or all(p == (0, 0) for p in pads):
            y = y / np.prod(kernel_shape)
        else:
            ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
            cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strd, pad)
            y = y / cnt
    return y


def _op_gemm(node: Node, a, b, c=None):
    alpha = float(node.attr("alpha", 1.0))
    beta = float(node.attr("beta", 1.0))
    if int(node.attr("transA", 0)):
        a = jnp.swapaxes(a, -1, -2)
    if int(node.attr("transB", 0)):
        b = jnp.swapaxes(b, -1, -2)
    y = alpha * (jnp.asarray(a) @ jnp.asarray(b))
    if c is not None:
        y = y + beta * jnp.asarray(c)
    return y


def _op_batchnorm(node: Node, x, scale, bias, mean, var):
    eps = float(node.attr("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (jnp.asarray(x) - mean.reshape(shape)) * (
        scale.reshape(shape) * jax.lax.rsqrt(jnp.asarray(var).reshape(shape) + eps)
    ) + bias.reshape(shape)


def _op_slice(node: Node, x, *rest):
    if rest:  # opset >= 10: starts, ends, [axes], [steps] as inputs
        starts = _np(rest[0]).tolist()
        ends = _np(rest[1]).tolist()
        axes = _np(rest[2]).tolist() if len(rest) > 2 else list(range(len(starts)))
        steps = _np(rest[3]).tolist() if len(rest) > 3 else [1] * len(starts)
    else:
        starts = list(node.attr("starts"))
        ends = list(node.attr("ends"))
        axes = list(node.attr("axes", list(range(len(starts)))))
        steps = [1] * len(starts)
    idx = [slice(None)] * (x.ndim if hasattr(x, "ndim") else len(x.shape))
    for s, e, a, st in zip(starts, ends, axes, steps):
        # ONNX clamps out-of-range ends (INT_MAX is common)
        e = None if e >= np.iinfo(np.int64).max // 2 else int(e)
        idx[int(a)] = slice(int(s), e, int(st))
    return x[tuple(idx)]


def _op_pad(node: Node, x, *rest):
    mode = node.attr("mode", b"constant")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    if rest:
        pads = _np(rest[0]).tolist()
        cval = float(_np(rest[1])) if len(rest) > 1 and rest[1] is not None else 0.0
    else:
        pads = list(node.attr("pads"))
        cval = float(node.attr("value", 0.0))
    nd = len(pads) // 2
    widths = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
    if mode == "constant":
        return jnp.pad(x, widths, constant_values=cval)
    return jnp.pad(x, widths, mode={"reflect": "reflect", "edge": "edge"}[mode])


def _softmax(node: Node, x):
    axis = int(node.attr("axis", -1))
    return jax.nn.softmax(jnp.asarray(x), axis=axis)


def _reduce(fn, node: Node, x, *rest):
    if rest and rest[0] is not None:
        axes = tuple(int(a) for a in _np(rest[0]).reshape(-1))
    else:
        axes = node.attr("axes", None)
        axes = tuple(int(a) for a in axes) if axes else None
    keep = bool(int(node.attr("keepdims", 1)))
    return fn(x, axis=axes, keepdims=keep)


_BINARY = {
    "Add": lambda a, b: a + b,
    "Sub": lambda a, b: a - b,
    "Mul": lambda a, b: a * b,
    "Div": lambda a, b: a / b,
    "Pow": lambda a, b: a**b,
    "Min": jnp.minimum,
    "Max": jnp.maximum,
    "MatMul": lambda a, b: jnp.asarray(a) @ jnp.asarray(b),
    "Greater": lambda a, b: a > b,
    "Less": lambda a, b: a < b,
    "Equal": lambda a, b: a == b,
    "And": jnp.logical_and,
    "Or": jnp.logical_or,
}

_UNARY = {
    "Relu": lambda x: jnp.maximum(x, 0),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Sqrt": jnp.sqrt,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Neg": lambda x: -x,
    "Abs": jnp.abs,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Erf": jax.scipy.special.erf,
    "Not": jnp.logical_not,
    "Identity": lambda x: x,
    "Softplus": jax.nn.softplus,
    "Reciprocal": lambda x: 1.0 / x,
}


def _eval_node(node: Node, vals: list):
    op = node.op_type
    x = vals[0] if vals else None
    if op in _UNARY:
        f = _UNARY[op]
        return np.asarray(f(x)) if _is_host(x) else f(x)
    if op in _BINARY:
        f = _BINARY[op]
        if all(_is_host(v) for v in vals):
            return np.asarray(f(_np(vals[0]), _np(vals[1])))
        return f(jnp.asarray(vals[0]), jnp.asarray(vals[1]))
    if op == "Conv":
        return _op_conv(node, *vals)
    if op == "Gemm":
        return _op_gemm(node, *vals)
    if op == "BatchNormalization":
        return _op_batchnorm(node, *vals)
    if op == "MaxPool":
        return _pool(node, x, jax.lax.max, -jnp.inf, is_avg=False)
    if op == "AveragePool":
        return _pool(node, x, jax.lax.add, 0.0, is_avg=True)
    if op == "GlobalAveragePool":
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)
    if op == "GlobalMaxPool":
        return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)
    if op == "Reshape":
        shape = [int(s) for s in _np(vals[1]).reshape(-1)]
        shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
        return x.reshape(shape)
    if op == "Transpose":
        perm = node.attr("perm", list(range(x.ndim))[::-1])
        return x.transpose([int(p) for p in perm])
    if op == "Flatten":
        ax = int(node.attr("axis", 1))
        lead = int(np.prod(x.shape[:ax])) if ax else 1
        return x.reshape(lead, -1)
    if op == "Squeeze":
        axes = vals[1] if len(vals) > 1 else node.attr("axes", None)
        if axes is None:
            return x.reshape([d for d in x.shape if d != 1])
        axes = sorted(int(a) % x.ndim for a in _np(axes).reshape(-1))
        return x.reshape([d for i, d in enumerate(x.shape) if i not in axes])
    if op == "Unsqueeze":
        axes = vals[1] if len(vals) > 1 else node.attr("axes")
        y = x
        for a in sorted(int(a) for a in _np(axes).reshape(-1)):
            y = jnp.expand_dims(y, a) if not _is_host(y) else np.expand_dims(y, a)
        return y
    if op == "Concat":
        ax = int(node.attr("axis"))
        if all(_is_host(v) for v in vals):
            return np.concatenate([_np(v) for v in vals], axis=ax)
        return jnp.concatenate([jnp.asarray(v) for v in vals], axis=ax)
    if op == "Slice":
        return _op_slice(node, *vals)
    if op == "Pad":
        return _op_pad(node, *vals)
    if op == "Shape":
        return np.asarray(x.shape, dtype=np.int64)  # static under jit
    if op == "Gather":
        ax = int(node.attr("axis", 0))
        idx = vals[1]
        if _is_host(x) and _is_host(idx):
            return np.take(_np(x), _np(idx).astype(np.int64), axis=ax)
        return jnp.take(jnp.asarray(x), jnp.asarray(idx), axis=ax)
    if op == "Cast":
        to = _DTYPES[int(node.attr("to"))]
        return _np(x).astype(to) if _is_host(x) else x.astype(to)
    if op == "Clip":
        lo = vals[1] if len(vals) > 1 else node.attr("min", None)
        hi = vals[2] if len(vals) > 2 else node.attr("max", None)
        y = jnp.asarray(x)
        if lo is not None:
            y = jnp.maximum(y, jnp.asarray(lo))
        if hi is not None:
            y = jnp.minimum(y, jnp.asarray(hi))
        return y
    if op == "Softmax":
        return _softmax(node, x)
    if op == "LeakyRelu":
        return jax.nn.leaky_relu(jnp.asarray(x), float(node.attr("alpha", 0.01)))
    if op == "Elu":
        return jax.nn.elu(jnp.asarray(x), float(node.attr("alpha", 1.0)))
    if op == "HardSigmoid":
        a = float(node.attr("alpha", 0.2))
        b = float(node.attr("beta", 0.5))
        return jnp.clip(a * jnp.asarray(x) + b, 0.0, 1.0)
    if op == "ReduceMean":
        return _reduce(jnp.mean if not _is_host(x) else np.mean, node, x, *vals[1:])
    if op == "ReduceSum":
        return _reduce(jnp.sum if not _is_host(x) else np.sum, node, x, *vals[1:])
    if op == "ReduceMax":
        return _reduce(jnp.max if not _is_host(x) else np.max, node, x, *vals[1:])
    if op == "ReduceMin":
        return _reduce(jnp.min if not _is_host(x) else np.min, node, x, *vals[1:])
    if op == "Constant":
        for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
            a = node.attrs.get(key)
            if a is not None:
                return np.asarray(a.value)
        raise ValueError("Constant node without value")
    if op == "ConstantOfShape":
        val = node.attr("value", np.zeros(1, np.float32))
        shape = [int(s) for s in _np(x).reshape(-1)]
        return np.full(shape, _np(val).reshape(-1)[0], dtype=_np(val).dtype)
    if op == "Expand":
        shape = [int(s) for s in _np(vals[1]).reshape(-1)]
        shape = [
            max(s, d) for s, d in zip(shape, (1,) * (len(shape) - x.ndim) + x.shape)
        ]
        return jnp.broadcast_to(x, shape) if not _is_host(x) else np.broadcast_to(x, shape)
    if op == "Where":
        if all(_is_host(v) for v in vals):
            return np.where(_np(vals[0]), _np(vals[1]), _np(vals[2]))
        return jnp.where(*[jnp.asarray(v) for v in vals])
    if op == "Dropout":
        return x  # inference mode
    if op == "LRN":
        raise NotImplementedError("LRN")
    raise NotImplementedError(f"ONNX op {op!r} not supported by onnx_lite")


def run(graph: Graph, feeds: Mapping[str, Any]) -> list:
    """Execute the graph; returns outputs in graph order.

    Feeds may be numpy or jax arrays; jax inputs keep the whole compute
    path traceable (wrap in ``jax.jit`` for TPU execution).
    """
    env: dict[str, Any] = dict(graph.initializers)
    env.update(feeds)
    env[""] = None  # optional inputs
    for node in graph.nodes:
        vals = [env[name] for name in node.inputs]
        if node.op_type == "Dropout":
            outs = [vals[0]]
        else:
            result = _eval_node(node, vals)
            outs = list(result) if isinstance(result, tuple) else [result]
        for name, v in zip(node.outputs, outs):
            if name:
                env[name] = v
    return [env[name] for name in graph.output_names]


def make_jit_runner(graph: Graph) -> Callable:
    """``f(**feeds) -> [outputs]`` with the device portion jitted once."""
    jit_run = jax.jit(lambda feeds: run(graph, feeds))

    def f(**feeds):
        return jit_run({k: jnp.asarray(v) for k, v in feeds.items()})

    return f


# --- encoder (test support: build ONNX bytes without the onnx package) --------


def _tag(fno: int, wt: int) -> bytes:
    return _enc_varint((fno << 3) | wt)


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(fno: int, payload: bytes) -> bytes:
    return _tag(fno, _WIRE_LEN) + _enc_varint(len(payload)) + payload


_NP_TO_ONNX = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.int32): 6, np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10, np.dtype(np.float64): 11,
}


def encode_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b""
    for d in arr.shape:
        out += _tag(1, _WIRE_VARINT) + _enc_varint(d)
    out += _tag(2, _WIRE_VARINT) + _enc_varint(_NP_TO_ONNX[arr.dtype])
    out += _len_field(8, name.encode())
    out += _len_field(9, arr.tobytes())
    return out


def encode_attr(name: str, value) -> bytes:
    out = _len_field(1, name.encode())
    if isinstance(value, float):
        out += _tag(2, _WIRE_I32) + struct.pack("<f", value)
        out += _tag(20, _WIRE_VARINT) + _enc_varint(1)  # FLOAT
    elif isinstance(value, bool) or isinstance(value, int):
        out += _tag(3, _WIRE_VARINT) + _enc_varint(int(value) & ((1 << 64) - 1))
        out += _tag(20, _WIRE_VARINT) + _enc_varint(2)  # INT
    elif isinstance(value, (bytes, str)):
        b = value.encode() if isinstance(value, str) else value
        out += _len_field(4, b)
        out += _tag(20, _WIRE_VARINT) + _enc_varint(3)  # STRING
    elif isinstance(value, np.ndarray):
        out += _len_field(5, encode_tensor("", value))
        out += _tag(20, _WIRE_VARINT) + _enc_varint(4)  # TENSOR
    elif isinstance(value, (list, tuple)) and value and isinstance(value[0], float):
        for f in value:
            out += _tag(6, _WIRE_I32) + struct.pack("<f", f)
        out += _tag(20, _WIRE_VARINT) + _enc_varint(6)  # FLOATS
    elif isinstance(value, (list, tuple)):
        for i in value:
            out += _tag(7, _WIRE_VARINT) + _enc_varint(int(i) & ((1 << 64) - 1))
        out += _tag(20, _WIRE_VARINT) + _enc_varint(7)  # INTS
    else:
        raise TypeError(type(value))
    return out


def encode_node(op_type: str, inputs, outputs, **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    out += _len_field(4, op_type.encode())
    for k, v in attrs.items():
        out += _len_field(5, encode_attr(k, v))
    return out


def _encode_value_info(name: str) -> bytes:
    return _len_field(1, name.encode())


def build_model_bytes(
    nodes: list[bytes],
    inputs: list[str],
    outputs: list[str],
    initializers: dict[str, np.ndarray] | None = None,
) -> bytes:
    g = b""
    for n in nodes:
        g += _len_field(1, n)
    g += _len_field(2, b"onnx_lite_test")
    for name, arr in (initializers or {}).items():
        g += _len_field(5, encode_tensor(name, arr))
    for i in inputs:
        g += _len_field(11, _encode_value_info(i))
    for o in outputs:
        g += _len_field(12, _encode_value_info(o))
    # ModelProto: ir_version (1) + graph (7) + opset_import (8) left minimal
    return _tag(1, _WIRE_VARINT) + _enc_varint(8) + _len_field(7, g)

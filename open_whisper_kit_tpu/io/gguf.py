"""GGUF container reader (pure Python/numpy).

Parses the GGUF v2/v3 key-value + tensor-blob format used by the reference's
streaming-sortformer model files (written by
streaming-sortformer/scripts/convert_to_gguf.py; format owned by
ggml/src/gguf.cpp).  Independent implementation from the public format spec.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import Any

import numpy as np

from . import quant

GGUF_MAGIC = b"GGUF"

# gguf metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, _T_STR, _T_ARR, \
    _T_U64, _T_I64, _T_F64 = range(13)

_SCALAR_FMT = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f",
    _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d",
}


@dataclasses.dataclass
class GGUFTensor:
    name: str
    shape: tuple[int, ...]     # numpy order (reversed gguf dims)
    ggml_type: int
    offset: int                # into the data section
    data: bytes | None = None

    @property
    def n_elems(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def to_float(self) -> np.ndarray:
        assert self.data is not None
        return quant.dequantize(self.data, self.ggml_type, self.n_elems).reshape(self.shape)


@dataclasses.dataclass
class GGUFFile:
    version: int
    metadata: dict[str, Any]
    tensors: dict[str, GGUFTensor]
    path: str = ""

    def to_float(self, name: str) -> np.ndarray:
        return self.tensors[name].to_float()


def _read(f, fmt):
    size = struct.calcsize(fmt)
    buf = f.read(size)
    if len(buf) != size:
        raise EOFError("unexpected EOF in GGUF file")
    out = struct.unpack(fmt, buf)
    return out[0] if len(out) == 1 else out


def _read_string(f) -> str:
    n = _read(f, "<Q")
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f, vtype: int):
    if vtype in _SCALAR_FMT:
        return _read(f, _SCALAR_FMT[vtype])
    if vtype == _T_BOOL:
        return bool(_read(f, "<B"))
    if vtype == _T_STR:
        return _read_string(f)
    if vtype == _T_ARR:
        etype = _read(f, "<I")
        n = _read(f, "<Q")
        if etype in _SCALAR_FMT and etype != _T_F64:
            fmt = _SCALAR_FMT[etype]
            dt = np.dtype(fmt[1]).newbyteorder("<")
            arr = np.frombuffer(f.read(dt.itemsize * n), dtype=dt)
            return arr.copy()
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"GGUF: unknown value type {vtype}")


def load_gguf(path: str | Path, load_tensors: bool = True) -> GGUFFile:
    path = Path(path)
    with open(path, "rb") as f:
        if f.read(4) != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        version = _read(f, "<I")
        if version < 2:
            raise ValueError(f"{path}: GGUF v{version} unsupported (need >=2)")
        n_tensors = _read(f, "<Q")
        n_kv = _read(f, "<Q")

        metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_string(f)
            vtype = _read(f, "<I")
            metadata[key] = _read_value(f, vtype)

        tensors: dict[str, GGUFTensor] = {}
        order: list[GGUFTensor] = []
        for _ in range(n_tensors):
            name = _read_string(f)
            n_dims = _read(f, "<I")
            dims = [_read(f, "<Q") for _ in range(n_dims)]
            ttype = _read(f, "<I")
            offset = _read(f, "<Q")
            t = GGUFTensor(name, tuple(int(d) for d in reversed(dims)), ttype, offset)
            tensors[name] = t
            order.append(t)

        alignment = int(metadata.get("general.alignment", 32))
        pos = f.tell()
        data_start = (pos + alignment - 1) // alignment * alignment

        if load_tensors:
            for t in order:
                f.seek(data_start + t.offset)
                t.data = f.read(quant.nbytes_for(t.ggml_type, t.n_elems))

    return GGUFFile(version, metadata, tensors, str(path))

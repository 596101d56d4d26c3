"""From-scratch .pth (PyTorch checkpoint) reader: zip container + a
restricted pickle VM. No torch dependency, no arbitrary code execution.

Reference equivalent: src/pth.rs (894 LoC pickle opcode VM + zip reader).
Supports the standard torch.save layout: archive/data.pkl referencing
storages in archive/data/<key>, tensors rebuilt via
torch._utils._rebuild_tensor_v2. Unknown reduce callables raise.
"""

from __future__ import annotations

import os
import struct
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..dtype import DType

_STORAGE_DTYPES = {
    "FloatStorage": DType.F32,
    "DoubleStorage": DType.F64,
    "HalfStorage": DType.F16,
    "BFloat16Storage": DType.BF16,
    "LongStorage": DType.I64,
    "IntStorage": DType.I32,
    "ShortStorage": DType.I16,
    "CharStorage": DType.I8,
    "ByteStorage": DType.U8,
    "BoolStorage": DType.BOOL,
}


class _Mark:
    pass


class _Storage:
    def __init__(self, dtype: DType, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self.data: Optional[np.ndarray] = None


class _LazyTensorRef:
    """Placeholder produced by _rebuild_tensor_v2."""

    def __init__(self, storage: _Storage, offset: int, shape: Tuple[int, ...],
                 strides: Tuple[int, ...]):
        self.storage = storage
        self.offset = offset
        self.shape = shape
        self.strides = strides

    def materialize(self) -> np.ndarray:
        flat = self.storage.data
        if flat is None:
            raise RuntimeError(f"storage {self.storage.key} not loaded")
        itemsize = int(self.storage.dtype.size_bytes)
        return np.lib.stride_tricks.as_strided(
            flat[self.offset:], shape=self.shape,
            strides=tuple(s * itemsize for s in self.strides)).copy()


def _reduce_dispatch(func_name: str, args: tuple):
    if func_name in ("torch._utils._rebuild_tensor_v2",
                     "torch._utils._rebuild_tensor"):
        storage, offset, size, stride = args[0], args[1], args[2], args[3]
        return _LazyTensorRef(storage, int(offset), tuple(size), tuple(stride))
    if func_name == "collections.OrderedDict":
        return dict(args[0]) if args else {}
    if func_name == "torch.serialization._get_layout":
        return args[0]
    if func_name in ("torch.Size",):
        return tuple(args[0])
    if func_name.endswith("._rebuild_parameter"):
        return args[0]
    raise ValueError(f"pth: refusing to call {func_name!r}")


class _PickleVM:
    """Restricted pickle protocol 2-5 interpreter."""

    def __init__(self, data: bytes, persistent_load):
        self.data = data
        self.pos = 0
        self.stack: List[Any] = []
        self.memo: Dict[int, Any] = {}
        self.persistent_load = persistent_load

    def _read(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def _line(self) -> bytes:
        end = self.data.index(b"\n", self.pos)
        b = self.data[self.pos:end]
        self.pos = end + 1
        return b

    def _pop_mark(self) -> list:
        items = []
        while True:
            v = self.stack.pop()
            if isinstance(v, _Mark):
                return items[::-1]
            items.append(v)

    def run(self):
        S = self.stack
        while True:
            op = self._read(1)
            if op == b"\x80":    # PROTO
                self._read(1)
            elif op == b"\x95":  # FRAME
                self._read(8)
            elif op == b"(":     # MARK
                S.append(_Mark())
            elif op == b".":     # STOP
                return S.pop()
            elif op == b"N":
                S.append(None)
            elif op == b"\x88":
                S.append(True)
            elif op == b"\x89":
                S.append(False)
            elif op == b"K":     # BININT1
                S.append(self._read(1)[0])
            elif op == b"M":     # BININT2
                S.append(struct.unpack("<H", self._read(2))[0])
            elif op == b"J":     # BININT
                S.append(struct.unpack("<i", self._read(4))[0])
            elif op == b"\x8a":  # LONG1
                n = self._read(1)[0]
                S.append(int.from_bytes(self._read(n), "little", signed=True))
            elif op == b"G":     # BINFLOAT
                S.append(struct.unpack(">d", self._read(8))[0])
            elif op == b"X":     # BINUNICODE
                n = struct.unpack("<I", self._read(4))[0]
                S.append(self._read(n).decode("utf-8"))
            elif op == b"\x8c":  # SHORT_BINUNICODE
                n = self._read(1)[0]
                S.append(self._read(n).decode("utf-8"))
            elif op == b"\x8d":  # BINUNICODE8
                n = struct.unpack("<Q", self._read(8))[0]
                S.append(self._read(n).decode("utf-8"))
            elif op == b"C":     # SHORT_BINBYTES
                n = self._read(1)[0]
                S.append(self._read(n))
            elif op == b"B":     # BINBYTES
                n = struct.unpack("<I", self._read(4))[0]
                S.append(self._read(n))
            elif op == b"\x8e":  # BINBYTES8
                n = struct.unpack("<Q", self._read(8))[0]
                S.append(self._read(n))
            elif op == b"]":     # EMPTY_LIST
                S.append([])
            elif op == b")":     # EMPTY_TUPLE
                S.append(())
            elif op == b"}":     # EMPTY_DICT
                S.append({})
            elif op == b"\x8f":  # EMPTY_SET
                S.append(set())
            elif op == b"t":     # TUPLE
                S.append(tuple(self._pop_mark()))
            elif op == b"\x85":  # TUPLE1
                S[-1:] = [(S[-1],)]
            elif op == b"\x86":  # TUPLE2
                S[-2:] = [(S[-2], S[-1])]
            elif op == b"\x87":  # TUPLE3
                S[-3:] = [(S[-3], S[-2], S[-1])]
            elif op == b"l":     # LIST
                S.append(self._pop_mark())
            elif op == b"a":     # APPEND
                v = S.pop()
                S[-1].append(v)
            elif op == b"e":     # APPENDS
                items = self._pop_mark()
                S[-1].extend(items)
            elif op == b"d":     # DICT
                items = self._pop_mark()
                S.append({items[i]: items[i + 1] for i in range(0, len(items), 2)})
            elif op == b"s":     # SETITEM
                v = S.pop()
                k = S.pop()
                S[-1][k] = v
            elif op == b"u":     # SETITEMS
                items = self._pop_mark()
                d = S[-1]
                for i in range(0, len(items), 2):
                    d[items[i]] = items[i + 1]
            elif op == b"q":     # BINPUT
                self.memo[self._read(1)[0]] = S[-1]
            elif op == b"r":     # LONG_BINPUT
                self.memo[struct.unpack("<I", self._read(4))[0]] = S[-1]
            elif op == b"\x94":  # MEMOIZE
                self.memo[len(self.memo)] = S[-1]
            elif op == b"h":     # BINGET
                S.append(self.memo[self._read(1)[0]])
            elif op == b"j":     # LONG_BINGET
                S.append(self.memo[struct.unpack("<I", self._read(4))[0]])
            elif op == b"c":     # GLOBAL
                module = self._line().decode()
                name = self._line().decode()
                S.append(f"{module}.{name}")
            elif op == b"\x93":  # STACK_GLOBAL
                name = S.pop()
                module = S.pop()
                S.append(f"{module}.{name}")
            elif op == b"R":     # REDUCE
                args = S.pop()
                func = S.pop()
                S.append(_reduce_dispatch(func, args))
            elif op == b"b":     # BUILD
                state = S.pop()
                obj = S[-1]
                if isinstance(obj, dict) and isinstance(state, dict):
                    obj.update(state)
                # tensors/params: ignore extra state
            elif op == b"Q":     # BINPERSID
                S.append(self.persistent_load(S.pop()))
            elif op == b"0":     # POP
                S.pop()
            elif op == b"2":     # DUP
                S.append(S[-1])
            else:
                raise ValueError(f"pth: unsupported pickle opcode {op!r} at {self.pos}")


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-saved checkpoint into {name: numpy array}."""
    storages: Dict[str, _Storage] = {}

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        root = pkl_name[: -len("data.pkl")]

        def persistent_load(pid):
            # ('storage', StorageType-string, key, location, numel)
            assert pid[0] == "storage", pid
            st_type = pid[1]
            if isinstance(st_type, str):
                st_name = st_type.rsplit(".", 1)[-1]
            else:
                st_name = str(st_type)
            key = pid[2]
            numel = pid[4]
            if key not in storages:
                dt = _STORAGE_DTYPES.get(st_name)
                if dt is None and st_name.endswith("Storage"):
                    # torch >= 2: UntypedStorage with dtype in tensor rebuild;
                    # treat as bytes, refined later
                    dt = DType.U8
                storages[key] = _Storage(dt, key, int(numel))
            return storages[key]

        result = _PickleVM(zf.read(pkl_name), persistent_load).run()

        # load storage payloads
        for key, st in storages.items():
            raw = zf.read(f"{root}data/{key}")
            st.data = np.frombuffer(raw, dtype=st.dtype.to_numpy())

    def walk(obj):
        if isinstance(obj, _LazyTensorRef):
            return obj.materialize()
        if isinstance(obj, dict):
            return {k: walk(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(walk(v) for v in obj)
        return obj

    out = walk(result)
    if isinstance(out, dict):
        # flatten one level of 'state_dict' style nesting
        if "state_dict" in out and isinstance(out["state_dict"], dict):
            out = out["state_dict"]
    return out


def _zip_data_offset(zf: zipfile.ZipFile, member: str) -> int:
    """Absolute byte offset of a zip member's payload. Torch writes
    checkpoint storages ZIP_STORED (uncompressed), so the payload is a
    contiguous raw byte span — exactly what an OriginReference ONNX
    points at. The local file header's own name/extra lengths are read
    (they can differ from the central directory's)."""
    info = zf.getinfo(member)
    if info.compress_type != zipfile.ZIP_STORED:
        raise ValueError(f"pth member {member!r} is compressed; "
                         "OriginReference needs raw byte spans")
    fp = zf.fp
    fp.seek(info.header_offset + 26)
    fnlen, extralen = struct.unpack("<HH", fp.read(4))
    return info.header_offset + 30 + fnlen + extralen


def load_pth_lazy(path: str) -> Dict[str, "object"]:
    """{name: LazyWeight} with byte-span origin metadata, for
    WeightStorage.origin_reference() exports that point back at this
    .pth file (reference OriginReferenceOutputManager pth branch,
    onnx_graph/weights.rs:250-261 + 300-364: external_data carries
    format/tensor_name/location/offset/length)."""
    from .onnx_builder import LazyWeight

    abs_path = os.path.abspath(path)
    storages: Dict[str, _Storage] = {}
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        root = pkl_name[: -len("data.pkl")]

        def persistent_load(pid):
            assert pid[0] == "storage", pid
            st_type = pid[1]
            st_name = (st_type.rsplit(".", 1)[-1]
                       if isinstance(st_type, str) else str(st_type))
            key = pid[2]
            if key not in storages:
                dt = _STORAGE_DTYPES.get(st_name)
                if dt is None and st_name.endswith("Storage"):
                    dt = DType.U8
                storages[key] = _Storage(dt, key, int(pid[4]))
            return storages[key]

        result = _PickleVM(zf.read(pkl_name), persistent_load).run()
        data_off = {key: _zip_data_offset(zf, f"{root}data/{key}")
                    for key in storages}

    out: Dict[str, object] = {}

    def walk(prefix, obj):
        if isinstance(obj, _LazyTensorRef):
            itemsize = int(obj.storage.dtype.size_bytes)
            numel = 1
            for d in obj.shape:
                numel *= int(d)
            # contiguity: origin spans can only describe dense
            # row-major tensors (torch checkpoints save contiguous)
            expect, ok = 1, True
            for d, s in zip(reversed(obj.shape), reversed(obj.strides)):
                ok = ok and (s == expect or d == 1)
                expect *= int(d)
            key = obj.storage.key

            def loader(o=obj):
                arrs = load_pth(path)
                cur = arrs
                for part in prefix.split("."):
                    cur = cur[part]
                return cur

            origin = None
            if ok:
                origin = {"format": "pth", "tensor_name": prefix,
                          "location": abs_path,
                          "offset": data_off[key] + obj.offset * itemsize,
                          "length": numel * itemsize}
            out[prefix] = LazyWeight(loader, obj.storage.dtype,
                                     obj.shape, origin=origin)
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)

    if isinstance(result, dict) and isinstance(
            result.get("state_dict"), dict):
        result = result["state_dict"]
    walk("", result)
    return out

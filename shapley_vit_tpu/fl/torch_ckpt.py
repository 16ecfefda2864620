"""Torch-free reader/writer for the torch zip checkpoint format (``.pth.tar``).

Reference clients save LoRA checkpoints with ``torch.save``
(``shapleyserver/local_training/client.py`` writes
``client_{i}_model/ViT_epoch_9.pth.tar``) and the reference server loads
them with ``torch.load`` (``shapleyserver/server2.py:68-81``). Our serve
loop ingests the same files, which previously meant two things we do not
want on a long-running server:

  * ``torch.load(..., weights_only=False)`` runs the FULL pickle machinery
    on a file written by an UNTRUSTED federated client — unpickling executes
    arbitrary constructors, i.e. remote code execution on the server.
  * importing torch inside the serve process violates the round-4 memory
    rule (BENCH_NOTES "serve() soak": torch's in-process state leaked with
    the tunnel client; the serve path must stay torch-free).

This module parses the format directly. A torch>=1.6 checkpoint is a zip
archive::

    <stem>/data.pkl      protocol-2 pickle of the saved object
    <stem>/data/<key>    raw little-endian storage bytes, one per tensor
    <stem>/version       b"3\\n"
    <stem>/byteorder     b"little" (newer writers)

Inside ``data.pkl`` every tensor is ``torch._utils._rebuild_tensor_v2(
storage, storage_offset, size, stride, requires_grad, backward_hooks)``
with the storage smuggled through the pickle *persistent-id* channel as
``('storage', <torch.XStorage class>, key, location, numel)``. Reading
therefore needs only a **restricted** unpickler: an allow-list of exactly
those globals, a ``persistent_load`` that maps storage keys to numpy
buffers, and a numpy ``as_strided`` for the tensor view. Everything else —
any other global — is rejected with :class:`UnsafeCheckpointError` before
it can execute.

Writing is the mirror image, with one twist: the pickle must *name*
``torch.FloatStorage`` et al. without importing torch (Python's pickler
verifies globals by importing them). We emit the protocol-2 opcode stream
by hand — the object graph is just dicts/strings/ints/tensors, so the
hand-rolled pickler is ~80 lines and produces files byte-compatible with
``torch.load`` (round-trip tested against the real torch in
``tests/test_torch_ckpt.py``).

bfloat16/float16 storages map to ``ml_dtypes.bfloat16``/``np.float16`` so
checkpoints from mixed-precision clients read without a torch detour.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import sys
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict, List, Tuple, Union

import numpy as np

__all__ = [
    "read_checkpoint",
    "write_checkpoint",
    "NativeFormatError",
    "UnsafeCheckpointError",
]


class NativeFormatError(ValueError):
    """The file is not a torch *zip* checkpoint (legacy pre-1.6 pickle
    stream, corrupt zip, or missing ``data.pkl``). Callers may fall back to
    torch itself for legacy files — with ``weights_only=True``."""


class UnsafeCheckpointError(pickle.UnpicklingError):
    """The checkpoint's pickle references a global outside the tensor
    allow-list. On a server ingesting untrusted client uploads this is
    treated as hostile, never silently executed."""


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax; host-side numpy dtype for bf16

    return np.dtype(ml_dtypes.bfloat16)


# torch storage class name -> numpy dtype (torch/serialization.py's
# TypedStorage._pickle_storage_type naming). bf16 resolves lazily so the
# module stays importable without ml_dtypes.
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype("<f8"),
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": "bfloat16",
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


class _StorageType:
    """Stand-in for the ``torch.XStorage`` class referenced inside the
    persistent id — carries only the element dtype."""

    def __init__(self, name: str):
        dt = _STORAGE_DTYPES[name]
        self.name = name
        self.dtype = _bfloat16_dtype() if dt == "bfloat16" else dt


def _rebuild_tensor_v2(
    storage: np.ndarray,
    storage_offset: int,
    size: Tuple[int, ...],
    stride: Tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    """numpy twin of ``torch._utils._rebuild_tensor_v2``: a strided view
    into the flat storage, copied out so the result owns its memory (the
    zip buffer is transient) and is C-contiguous for the converters.

    shape/stride/offset come from the UNTRUSTED pickle — ``as_strided``
    performs no bounds checks, so without the validation below a hostile
    checkpoint reads out of bounds (heap disclosure into the returned
    tensor, or a straight segfault that no ``on_error='skip'`` can catch).
    Every element the strided view can touch must lie inside the storage."""
    size = tuple(int(d) for d in size)
    stride = tuple(int(s) for s in stride)
    storage_offset = int(storage_offset)
    if len(size) != len(stride):
        raise UnsafeCheckpointError(
            f"tensor size/stride rank mismatch: {size} vs {stride}"
        )
    if storage_offset < 0 or any(d < 0 for d in size) or any(
        s < 0 for s in stride
    ):
        raise UnsafeCheckpointError(
            f"negative tensor geometry: offset={storage_offset}, "
            f"size={size}, stride={stride}"
        )
    if 0 not in size:
        # furthest element a C-order walk can touch (stride 0 = broadcast
        # dims, which torch produces for expanded tensors, are fine)
        last = storage_offset + sum((d - 1) * s for d, s in zip(size, stride))
        if last >= storage.size:
            raise UnsafeCheckpointError(
                f"tensor geometry reads past its storage: offset="
                f"{storage_offset}, size={size}, stride={stride} needs "
                f"element {last} of a {storage.size}-element storage"
            )
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    # copy (not ascontiguousarray, which promotes 0-d to 1-d): the result
    # must own its memory — the zip buffer is transient
    return view.copy(order="C")


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data  # nn.Parameter decays to its tensor


# (module, name) -> replacement. Anything NOT here is rejected.
_SAFE_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): OrderedDict,
    ("torch", "Size"): tuple,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, storage_loader):
        super().__init__(file)
        self._load_storage = storage_loader

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        raise UnsafeCheckpointError(
            f"checkpoint pickle references {module}.{name!r}, outside the "
            "tensor allow-list — refusing to unpickle an untrusted client "
            "checkpoint (reference torch.load would have executed it)"
        )

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel) —
        # torch/serialization.py persistent_id
        if not (isinstance(pid, tuple) and len(pid) == 5 and pid[0] == "storage"):
            raise UnsafeCheckpointError(f"unknown persistent id {pid!r}")
        _, stype, key, _location, numel = pid
        if not isinstance(stype, _StorageType):
            raise UnsafeCheckpointError(
                f"unsupported storage type in persistent id: {stype!r}"
            )
        numel = int(numel)
        if numel < 0:
            raise UnsafeCheckpointError(f"negative storage numel {numel}")
        return self._load_storage(str(key), stype.dtype, numel)


def _archive_prefix(names: List[str]) -> str:
    """torch writes every record under ``<stem>/``; find it via data.pkl."""
    for n in names:
        if n == "data.pkl":
            return ""
        if n.endswith("/data.pkl") and n.count("/") == 1:
            return n[: -len("data.pkl")]
    raise NativeFormatError("no data.pkl record — not a torch zip checkpoint")


def read_checkpoint(src: Union[str, bytes, BinaryIO]) -> Any:
    """Parse a torch>=1.6 zip checkpoint into plain Python + numpy.

    ``src``: a path, raw bytes, or a binary file object. Tensors come back
    as numpy arrays (bf16 as ``ml_dtypes.bfloat16``); containers as the
    pickled dict/list/OrderedDict structure. Raises
    :class:`NativeFormatError` for non-zip (legacy) files and
    :class:`UnsafeCheckpointError` for pickles that stray off the tensor
    allow-list."""
    if isinstance(src, bytes):
        src = io.BytesIO(src)
    try:
        zf = zipfile.ZipFile(src)
    except zipfile.BadZipFile as e:
        raise NativeFormatError(
            f"not a zip archive ({e}); legacy torch formats need torch itself"
        ) from None
    with zf:
        names = zf.namelist()
        prefix = _archive_prefix(names)
        have = set(names)

        storages: Dict[str, np.ndarray] = {}  # torch dedups shared storages

        def load_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            cached = storages.get(key)
            if cached is not None:
                return cached
            rec = f"{prefix}data/{key}"
            if rec not in have:
                raise NativeFormatError(f"missing storage record {rec}")
            raw = zf.read(rec)
            nbytes = numel * dtype.itemsize
            if len(raw) < nbytes:
                raise NativeFormatError(
                    f"storage {rec}: {len(raw)} bytes < expected {nbytes}"
                )
            # frombuffer is read-only and zero-copy; rebuild copies out
            storages[key] = np.frombuffer(raw, dtype=dtype, count=numel)
            return storages[key]

        bo = f"{prefix}byteorder"
        if bo in have and zf.read(bo).strip() not in (b"little", b""):
            raise NativeFormatError("big-endian checkpoint not supported")
        with zf.open(f"{prefix}data.pkl") as pkl:
            return _RestrictedUnpickler(pkl, load_storage).load()


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------

_NP_TO_STORAGE = {
    np.dtype("f8"): "DoubleStorage",
    np.dtype("f4"): "FloatStorage",
    np.dtype("f2"): "HalfStorage",
    np.dtype("i8"): "LongStorage",
    np.dtype("i4"): "IntStorage",
    np.dtype("i2"): "ShortStorage",
    np.dtype("i1"): "CharStorage",
    np.dtype("u1"): "ByteStorage",
    np.dtype("?"): "BoolStorage",
    np.dtype("c8"): "ComplexFloatStorage",
    np.dtype("c16"): "ComplexDoubleStorage",
}


def _storage_name(dtype: np.dtype) -> str:
    if dtype in _NP_TO_STORAGE:
        return _NP_TO_STORAGE[dtype]
    try:
        if dtype == _bfloat16_dtype():
            return "BFloat16Storage"
    except ImportError:
        pass
    raise TypeError(f"no torch storage type for numpy dtype {dtype}")


class _Pickler:
    """Hand-rolled protocol-2 pickler for the checkpoint object graph:
    dict/OrderedDict/list/tuple/str/int/float/bool/None + numpy arrays.

    Exists because Python's :class:`pickle.Pickler` verifies every GLOBAL
    by importing it — naming ``torch.FloatStorage`` would import torch at
    write time, exactly what this module removes. The opcode stream (see
    the module docstring) carries the names as text; only the *reader*
    resolves them."""

    def __init__(self, out: io.BytesIO):
        self.out = out
        self.storages: List[np.ndarray] = []  # flat little-endian buffers

    # -- primitives ---------------------------------------------------------
    def _global(self, module: str, name: str) -> None:
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def _str(self, s: str) -> None:
        b = s.encode("utf-8")
        self.out.write(b"X" + struct.pack("<I", len(b)) + b)

    def _int(self, v: int) -> None:
        if 0 <= v < 256:
            self.out.write(b"K" + bytes([v]))
        elif 0 <= v < 65536:
            self.out.write(b"M" + struct.pack("<H", v))
        elif -(2**31) <= v < 2**31:
            self.out.write(b"J" + struct.pack("<i", v))
        else:
            enc = v.to_bytes((v.bit_length() + 8) // 8, "little", signed=True)
            self.out.write(b"\x8a" + bytes([len(enc)]) + enc)

    def _float(self, v: float) -> None:
        self.out.write(b"G" + struct.pack(">d", v))

    # -- composites ---------------------------------------------------------
    def _tuple(self, items) -> None:
        self.out.write(b"(")  # MARK
        for it in items:
            self.save(it)
        self.out.write(b"t")

    def _tensor(self, arr: np.ndarray) -> None:
        arr = np.asarray(arr)
        flat = np.ravel(arr, order="C")  # copies iff non-contiguous; keeps 0-d shape on arr
        # little-endian on disk regardless of host order
        if flat.dtype.byteorder == ">" or (
            flat.dtype.byteorder == "=" and sys.byteorder == "big"
        ):
            flat = flat.astype(flat.dtype.newbyteorder("<"))
        key = str(len(self.storages))
        self.storages.append(flat)
        sname = _storage_name(flat.dtype.newbyteorder("="))
        # contiguous strides in ELEMENTS (torch convention)
        strides, acc = [], 1
        for d in reversed(arr.shape):
            strides.append(acc)
            acc *= d
        strides.reverse()
        self._global("torch._utils", "_rebuild_tensor_v2")
        self.out.write(b"(")  # args MARK
        # persistent id ('storage', Class, key, 'cpu', numel) via BINPERSID
        self.out.write(b"(")
        self._str("storage")
        self._global("torch", sname)
        self._str(key)
        self._str("cpu")
        self._int(int(flat.size))
        self.out.write(b"tQ")  # TUPLE, BINPERSID
        self._int(0)  # storage_offset
        self._tuple(tuple(int(d) for d in arr.shape))
        self._tuple(tuple(strides))
        self.out.write(b"\x89")  # requires_grad=False
        self._global("collections", "OrderedDict")
        self.out.write(b")R")  # empty backward_hooks OrderedDict
        self.out.write(b"tR")  # close args tuple, REDUCE

    def save(self, obj: Any) -> None:
        if obj is None:
            self.out.write(b"N")
        elif isinstance(obj, (bool, np.bool_)):
            self.out.write(b"\x88" if obj else b"\x89")
        elif isinstance(obj, str):
            self._str(obj)
        elif isinstance(obj, (int, np.integer)):
            self._int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self._float(float(obj))
        elif isinstance(obj, np.ndarray):
            self._tensor(obj)
        elif isinstance(obj, dict):
            if isinstance(obj, OrderedDict):
                self._global("collections", "OrderedDict")
                self.out.write(b")R")
            else:
                self.out.write(b"}")
            self.out.write(b"(")
            for k, v in obj.items():
                self.save(k)
                self.save(v)
            self.out.write(b"u")  # SETITEMS
        elif isinstance(obj, (list,)):
            self.out.write(b"](")
            for it in obj:
                self.save(it)
            self.out.write(b"e")  # APPENDS
        elif isinstance(obj, tuple):
            self._tuple(obj)
        else:
            raise TypeError(
                f"cannot serialize {type(obj).__name__} into a torch "
                "checkpoint (supported: dict/list/tuple/str/int/float/"
                "bool/None/ndarray)"
            )

    def dumps(self, obj: Any) -> bytes:
        self.out.write(b"\x80\x02")  # PROTO 2
        self.save(obj)
        self.out.write(b".")
        return self.out.getvalue()


def write_checkpoint(path: str, obj: Any, archive_name: str = None) -> None:
    """Write ``obj`` as a torch-zip checkpoint loadable by ``torch.load``
    (and by :func:`read_checkpoint`), atomically (tmp + rename — the
    existence==completeness ingestion protocol, reference client.py's
    save-then-move). No torch import."""
    if archive_name is None:
        base = os.path.basename(path)
        archive_name = base[: base.index(".")] if "." in base else base
    p = _Pickler(io.BytesIO())
    payload = p.dumps(obj)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", payload)
        zf.writestr(f"{archive_name}/byteorder", b"little")
        for i, flat in enumerate(p.storages):
            zf.writestr(f"{archive_name}/data/{i}", flat.tobytes())
        zf.writestr(f"{archive_name}/version", b"3\n")
    os.replace(tmp, path)

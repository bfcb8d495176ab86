"""Torch-free reader for torch checkpoint files (zip format).

Parses both layouts the teacher loader meets (SURVEY.md §7 step 2 asked for
a no-torch load path; reference model/utils.py:68-78 uses torch.jit.load):

* **torchscript archives** (the official OpenAI CLIP ``.pt`` files): a zip
  holding ``<name>/data.pkl`` — a pickle of the scripted module's object
  tree, where every ``__torch__.*`` class is built via NEWOBJ + BUILD with
  an attribute dict — plus raw tensor storages under ``<name>/data/<key>``.
  The state dict is recovered by walking the attribute tree and collecting
  tensor leaves under dotted names (exactly ``module.state_dict()``'s keys).
* **plain ``torch.save`` zips**: same container, but ``data.pkl`` unpickles
  directly to the (possibly nested) state-dict mapping.

Only the pickle *data model* is interpreted — no torch import.  Tensors are
rebuilt from raw little-endian storages with numpy (bfloat16 via ml_dtypes,
which JAX always ships).  Legacy non-zip files raise ``UnsupportedTorchFile``
so callers can fall back to torch as an IO-only last resort.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np


class UnsupportedTorchFile(Exception):
    """Raised when the file is not a zip-format torch checkpoint."""


_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bfloat16_dtype():
    import ml_dtypes  # shipped with jax

    return np.dtype(ml_dtypes.bfloat16)


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. met in GLOBAL opcodes."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        if self.name == "BFloat16Storage":
            return _bfloat16_dtype()
        try:
            return np.dtype(_STORAGE_DTYPES[self.name])
        except KeyError:
            raise UnsupportedTorchFile(f"unknown storage type torch.{self.name}")


class _TorchObj:
    """Generic shell for ``__torch__.*`` / ``torch.nn`` pickled objects.

    NEWOBJ creates it empty; BUILD lands the attribute dict in ``__dict__``
    (insertion order preserved — it IS the state_dict order).
    """

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # (dict, slots) two-tuple form
            d = state[0] if isinstance(state, tuple) and state else {}
            if isinstance(d, dict):
                self.__dict__.update(d)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    data, dtype = storage  # (bytes, np.dtype) resolved by persistent_load
    arr = np.frombuffer(data, dtype=dtype)
    if storage_offset:
        arr = arr[storage_offset:]
    if not size:
        return arr[:1].reshape(())
    n = int(np.prod(size))
    # torch storages for checkpoint tensors are contiguous; honor stride
    # anyway via as_strided (then copy so the buffer can be released)
    itemsize = arr.dtype.itemsize
    byte_strides = tuple(int(s) * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(arr, shape=tuple(int(s) for s in size),
                                          strides=byte_strides)
    return np.array(out, copy=True)


def _rebuild_parameter(tensor, requires_grad=True, backward_hooks=None):
    return tensor


def _noop(*args, **kwargs):  # hooks containers etc.
    return None


class _TorchUnpickler(pickle.Unpickler):
    """Unpickler resolving only the symbols torch checkpoints actually use."""

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="latin1")
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            return _noop
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name in ("Size",):
            return tuple
        # __torch__.* script classes and torch.nn modules: generic shells
        if module.startswith("__torch__") or module.startswith("torch."):
            return type(name, (_TorchObj,), {"__module__": module})
        if module == "builtins":
            return getattr(__import__("builtins"), name)
        raise UnsupportedTorchFile(f"unexpected global {module}.{name}")

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise UnsupportedTorchFile(f"unexpected persistent id {pid!r}")
        storage_type, key = pid[1], pid[2]
        dtype = storage_type.dtype
        data = self._zf.read(f"{self._prefix}/data/{key}")
        return (data, dtype)


def _is_tensor(x) -> bool:
    return isinstance(x, np.ndarray)


def _walk_module(obj, prefix: str, out: Dict[str, np.ndarray]):
    """Collect tensor attributes of a script-module tree under dotted keys
    (the order/paths of ``module.state_dict()``)."""
    for name, value in vars(obj).items():
        key = f"{prefix}{name}"
        if _is_tensor(value):
            out[key] = value
        elif isinstance(value, _TorchObj):
            _walk_module(value, key + ".", out)


def _flatten_mapping(obj, prefix: str, out: Dict[str, np.ndarray]):
    for name, value in obj.items():
        key = f"{prefix}{name}"
        if _is_tensor(value):
            out[key] = value
        elif isinstance(value, dict):
            _flatten_mapping(value, key + ".", out)


def read_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Torch checkpoint -> {dotted_key: np.ndarray} without importing torch."""
    if not zipfile.is_zipfile(path):
        raise UnsupportedTorchFile(f"{path} is not a zip-format torch file")
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise UnsupportedTorchFile(f"{path} has no data.pkl")
        pkl_name = min(pkl_names, key=len)
        prefix = pkl_name[: -len("/data.pkl")]
        obj = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), zf, prefix).load()

    out: Dict[str, np.ndarray] = {}
    if isinstance(obj, dict):
        src = obj.get("state_dict", obj)
        if isinstance(src, dict):
            _flatten_mapping(src, "", out)
        else:
            _walk_module(src, "", out)
    elif isinstance(obj, _TorchObj):
        _walk_module(obj, "", out)
    else:
        raise UnsupportedTorchFile(f"unexpected checkpoint root {type(obj)!r}")
    if not out:
        raise UnsupportedTorchFile(f"no tensors found in {path}")
    return out

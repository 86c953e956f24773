"""ctypes bindings for the native input-pipeline helpers (fastparse.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry point has a pure-Python fallback so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fastparse.cpp"
_LIB = _HERE / "libfastparse.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        # a package shipped with the .so but without the .cpp source must
        # still load (stat() on the missing source would raise); an existing
        # .so with no source to compare against is accepted as-is
        if _LIB.exists() and (
            not _SRC.exists() or _LIB.stat().st_mtime >= _SRC.stat().st_mtime
        ):
            return True
        if not _SRC.exists():
            return False
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            # e.g. a -march=native .so built on an incompatible host
            _build_failed = True
            return None
        lib.fp_parse_fasta.restype = ctypes.c_void_p
        lib.fp_parse_fasta.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fp_free.argtypes = [ctypes.c_void_p]
        lib.fp_encode_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int8,
            ctypes.c_int8,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.fp_multihot.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_fasta(path: str, sep: str = " ") -> List[Tuple[str, str, List[str]]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastparse unavailable")
    out_len = ctypes.c_int64()
    nrec = ctypes.c_int64()
    ptr = lib.fp_parse_fasta(path.encode(), ctypes.byref(out_len), ctypes.byref(nrec))
    if not ptr:
        raise FileNotFoundError(path)
    try:
        raw = ctypes.string_at(ptr, out_len.value)
    finally:
        lib.fp_free(ptr)
    records: List[Tuple[str, str, List[str]]] = []
    if not raw:
        return records
    sep_b = sep.encode()
    for line in raw.splitlines():
        header, _, seq = line.partition(b"\t")
        parts = header.split(sep_b)
        records.append(
            (seq.decode(), parts[0].decode(), [p.decode() for p in parts[1:] if p])
        )
    return records


def encode_batch(
    sequences: List[bytes] | List[str],
    lut: np.ndarray,
    unknown_id: int,
    pad_id: int,
    padded_len: int,
) -> np.ndarray:
    """Encode a list of residue strings to a (n, padded_len) int8 id matrix."""
    n = len(sequences)
    seq_bytes = [s.encode() if isinstance(s, str) else s for s in sequences]
    lib = _load()
    out = np.empty((n, padded_len), dtype=np.int8)
    if lib is None:
        for i, s in enumerate(seq_bytes):
            arr = np.frombuffer(s[:padded_len], dtype=np.uint8)
            ids = lut[arr]
            ids = np.where(ids < 0, unknown_id, ids)
            out[i, : len(ids)] = ids
            out[i, len(ids) :] = pad_id
        return out
    concat = b"".join(seq_bytes)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seq_bytes], out=offsets[1:])
    lut8 = np.ascontiguousarray(lut, dtype=np.int8)
    lib.fp_encode_batch(
        concat,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        lut8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        unknown_id,
        pad_id,
        padded_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out


def multihot(label_id_lists: List[np.ndarray], num_labels: int) -> np.ndarray:
    """Build a (n, num_labels) uint8 multi-hot matrix."""
    n = len(label_id_lists)
    out = np.zeros((n, num_labels), dtype=np.uint8)
    lib = _load()
    if lib is None:
        for i, ids in enumerate(label_id_lists):
            out[i, np.asarray(ids, dtype=np.int64)] = 1
        return out
    flat = (
        np.concatenate([np.asarray(x, dtype=np.int32) for x in label_id_lists])
        if label_id_lists and any(len(x) for x in label_id_lists)
        else np.zeros(0, dtype=np.int32)
    )
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(x) for x in label_id_lists], out=offsets[1:])
    lib.fp_multihot(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        num_labels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out

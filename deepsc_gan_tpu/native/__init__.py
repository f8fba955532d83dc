"""Native (C++) data-pipeline acceleration, bound via ctypes.

The Europarl preprocessing hot loop is per-line regex passes
(SURVEY.md §3.1); `text_pipeline.cc` fuses the reference's 5-pass
normalization into one C pass (~20-40x the Python/regex path). The .so is
built lazily with g++ on first use and cached next to the source — no
pip/pybind11 dependency. If no compiler is available, callers fall back to
the pure-Python path (`data/preprocess.py`), which is the semantic source
of truth these bindings are tested against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtextpipe.so")
_SRC = os.path.join(_DIR, "text_pipeline.cc")
_SRC_BLEU = os.path.join(_DIR, "bleu.cc")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library if needed. Returns error text or None."""
    srcs = [_SRC, _SRC_BLEU]
    if os.path.exists(_SO) and all(
            os.path.getmtime(_SO) >= os.path.getmtime(s) for s in srcs):
        return None
    cmd = ["g++", "-O2", "-shared", "-fPIC", *srcs, "-o", _SO]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    return proc.stderr if proc.returncode != 0 else None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    err = _build()
    if err:
        _build_error = err
        return None
    lib = ctypes.CDLL(_SO)
    lib.dsc_normalize.restype = ctypes.c_int
    lib.dsc_normalize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
    lib.dsc_normalize_batch.restype = ctypes.c_int
    lib.dsc_normalize_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.dsc_pad_sequences.restype = None
    lib.dsc_pad_sequences.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.dsc_bleu_batch.restype = ctypes.c_int
    lib.dsc_bleu_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def normalize_string(s: str) -> str:
    """Native equivalent of data.preprocess.normalize_string."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native build failed: {_build_error}")
    raw = s.encode("utf-8")
    cap = 2 * len(raw) + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.dsc_normalize(raw, len(raw), out, cap)
    if n < 0:
        raise RuntimeError("normalize buffer overflow")
    return out.raw[:n].decode("ascii")


def normalize_lines(lines: Sequence[str]) -> List[str]:
    """Batch normalization through one C call."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native build failed: {_build_error}")
    blobs = [s.encode("utf-8") for s in lines]
    buf = b"".join(blobs)
    offsets = np.zeros(len(blobs) + 1, np.int32)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    out_cap = 2 * len(buf) + 16 * len(blobs) + 16
    out = ctypes.create_string_buffer(out_cap)
    out_offsets = np.zeros(len(blobs) + 1, np.int32)
    n = lib.dsc_normalize_batch(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(blobs), out, out_cap,
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if n < 0:
        raise RuntimeError("normalize buffer overflow")
    raw = out.raw
    return [raw[out_offsets[i]:out_offsets[i + 1]].decode("ascii")
            for i in range(len(blobs))]


def bleu_batch(refs: Sequence[Sequence[int]], hyps: Sequence[Sequence[int]],
               weights: Sequence[float]) -> np.ndarray:
    """Per-pair sentence BLEU over integer token sequences — exact NLTK
    `sentence_bleu` semantics (single reference, method0 smoothing).
    Tokens may be any int ids; the text path interns words first."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native build failed: {_build_error}")
    assert len(refs) == len(hyps)

    def flatten(seqs):
        flat = np.fromiter((t for s in seqs for t in s), np.int32,
                           count=sum(len(s) for s in seqs))
        off = np.zeros(len(seqs) + 1, np.int32)
        np.cumsum([len(s) for s in seqs], out=off[1:])
        return flat, off

    rflat, roff = flatten(refs)
    hflat, hoff = flatten(hyps)
    w = np.asarray(list(weights) + [0.0] * (4 - len(weights)), np.float64)
    out = np.empty(len(refs), np.float64)
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.dsc_bleu_batch(
        rflat.ctypes.data_as(ip), roff.ctypes.data_as(ip),
        hflat.ctypes.data_as(ip), hoff.ctypes.data_as(ip), len(refs),
        w.ctypes.data_as(dp), out.ctypes.data_as(dp))
    return out


def pad_sequences(seqs: Sequence[Sequence[int]], maxlen: int = 31,
                  pad_value: int = 0) -> np.ndarray:
    """Native equivalent of data.loader.pad_sequences."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native build failed: {_build_error}")
    flat = np.fromiter((t for s in seqs for t in s), np.int32)
    offsets = np.zeros(len(seqs) + 1, np.int32)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    out = np.empty((len(seqs), maxlen), np.int32)
    lib.dsc_pad_sequences(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(seqs), maxlen, pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out

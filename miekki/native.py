"""Build-and-load for the C signature kernel (miekki/_sigkernel.c).

The .so is compiled once per (source-hash, host) into a shared cache
dir and dlopen'd by every process that wants it — driver and Python
workers alike (same host in local mode). A flock serializes the
one-time build across concurrently-spawning workers. Any failure
(no gcc, bad arch, read-only fs) degrades silently to None and the
caller keeps the numpy path: the native kernel is a measured-equal
fast path (tests/test_native.py pins bit-parity), never a semantic
dependency.

MIEKKI_NATIVE=0 disables the native path outright.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_sigkernel.c")


def _build_dir(src_hash: str) -> str:
    base = os.environ.get("MIEKKI_NATIVE_DIR")
    if not base:
        # /dev/shm is host-local + fast; fall back to tmp
        base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, f"miekki_native_{src_hash}")


def load() -> ctypes.CDLL | None:
    """The compiled kernel library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MIEKKI_NATIVE", "1") == "0":
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        h = hashlib.sha256(src).hexdigest()[:16]
        d = _build_dir(h)
        so = os.path.join(d, "libsigkernel.so")
        if not os.path.exists(so):
            os.makedirs(d, exist_ok=True)
            import fcntl
            with open(os.path.join(d, ".lock"), "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                if not os.path.exists(so):
                    tmp = so + f".tmp{os.getpid()}"
                    subprocess.run(
                        ["gcc", "-O3", "-march=native", "-shared", "-fPIC",
                         "-o", tmp, _SRC],
                        check=True, capture_output=True, timeout=120)
                    os.rename(tmp, so)  # atomic publish
        lib = ctypes.CDLL(so)
        lib.sig_kernel.restype = ctypes.c_int
        lib.sig_kernel.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.xxh64_one.restype = ctypes.c_uint64
        lib.xxh64_one.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint64]
        lib.anchor_kernel.restype = ctypes.c_int64
        lib.anchor_kernel.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.runs_kernel.restype = ctypes.c_int
        lib.runs_kernel.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        # smoke: pinned vector (b"abc", seed 42) must match the oracle
        buf = (ctypes.c_char * 3).from_buffer_copy(b"abc")
        got = lib.xxh64_one(ctypes.addressof(buf), 3, 42)
        from oracle.xxh64 import xxh64_bytes
        if got != xxh64_bytes(b"abc", 42) & 0xFFFFFFFFFFFFFFFF:
            return None  # miscompiled — keep numpy
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB

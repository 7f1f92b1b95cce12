"""Bit-parity of the compiled C signature kernel (miekki/_sigkernel.c)
against the numpy reference path — same batches, byte-identical Arrow
output. The C path is a fast-path only: when gcc is missing the loader
returns None and these tests skip (the numpy path stays pinned by the
golden-signature suite either way)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from miekki.config import DedupConfig
from miekki import native
from miekki.kernels import make_text_signature_kernel


def _batch(texts):
    return pa.record_batch(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
         "norm_text": pa.array(texts, type=pa.string())})


def _run(batch, use_native):
    old = os.environ.get("MIEKKI_NATIVE")
    os.environ["MIEKKI_NATIVE"] = "1" if use_native else "0"
    native._TRIED, native._LIB = False, None
    try:
        kern = make_text_signature_kernel(DedupConfig())
        return list(kern(iter([batch])))
    finally:
        native._TRIED, native._LIB = False, None
        if old is None:
            os.environ.pop("MIEKKI_NATIVE", None)
        else:
            os.environ["MIEKKI_NATIVE"] = old


needs_native = pytest.mark.skipif(native.load() is None,
                                  reason="no C toolchain")


@needs_native
def test_native_parity_mixed_corpus():
    rng = np.random.Generator(np.random.PCG64(11))
    words = rng.integers(0, 5000, size=400 * 60)
    texts = [" ".join(f"w{w:04d}" for w in words[i * 60:(i + 1) * 60])
             for i in range(400)]
    # adversarial rows: empty, shorter than k, exactly k, multi-byte
    # UTF-8 crossing window boundaries, huge repetition (distinct ~ 6)
    texts += ["", "a", "ab", "abcd", "abcde", "abcdef",
              "日本語のテキスト abc def", "ü" * 3, "naïve café déjà vu",
              "aaaaaa" * 500, "x", "δοκιμή κείμενο " * 40]
    b = _batch(texts)
    ref = _run(b, use_native=False)
    got = _run(b, use_native=True)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert r.equals(g)


@needs_native
def test_native_parity_sliced_batch():
    # Arrow slices share buffers with a non-zero offset; _utf8_view
    # must rebase identically on both paths
    texts = ["hello world " * 20, "short", "", "ünïcodé text here"] * 8
    full = _batch(texts)
    b = full.slice(5, 17)
    ref = _run(b, use_native=False)
    got = _run(b, use_native=True)
    for r, g in zip(ref, got):
        assert r.equals(g)


@needs_native
def test_native_anchor_parity():
    from miekki.config import DedupConfig
    from miekki.substr_kernels import batch_doc_anchors

    cfg = DedupConfig()
    k, w = cfg.anchor_k, cfg.winnow_w
    rng = np.random.Generator(np.random.PCG64(5))
    words = rng.integers(0, 9999, size=300 * 60)
    texts = [" ".join(f"w{x:04d}" for x in words[i * 60:(i + 1) * 60])
             for i in range(300)]
    texts += ["", "a" * 10, "b" * (k - 1), "c" * k, "d" * (k + 5),
              "e" * (w + k - 1), "f" * (w + k), "ab" * 400, "ü" * 200,
              "boilerplate " * 100]
    bs = [t.encode() for t in texts]
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    offs = np.cumsum([0] + [len(b) for b in bs]).astype(np.int64)

    def run(use_native):
        old = os.environ.get("MIEKKI_NATIVE")
        os.environ["MIEKKI_NATIVE"] = "1" if use_native else "0"
        native._TRIED, native._LIB = False, None
        try:
            return batch_doc_anchors(data, offs, k, w)
        finally:
            native._TRIED, native._LIB = False, None
            if old is None:
                os.environ.pop("MIEKKI_NATIVE", None)
            else:
                os.environ["MIEKKI_NATIVE"] = old

    ref, got = run(False), run(True)
    assert len(ref[0]) > 0
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


@needs_native
def test_native_xxh64_vectors():
    import ctypes

    from oracle.xxh64 import xxh64_bytes

    lib = native.load()
    for payload in [b"", b"a", b"abc", b"0123456789abcdef0123456789abcdef!",
                    bytes(range(256)), "héllo wörld".encode()]:
        for seed in (0, 42, 2**63):
            buf = (ctypes.c_char * max(1, len(payload))).from_buffer_copy(
                payload or b"\0")
            got = lib.xxh64_one(ctypes.addressof(buf), len(payload), seed)
            assert got == xxh64_bytes(payload, seed)

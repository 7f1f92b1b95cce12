"""Oracle for the exact-substring pass — deliberately naive
implementations, independent of miekki.substr_kernels' vectorized
code (SURVEY.md §5.1).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

from miekki.substr_kernels import ROLL_BASE, fmix64

MASK = (1 << 64) - 1


def window_hashes_naive(data: bytes, k: int) -> list[int]:
    """Direct O(n*k) polynomial hash of every k-byte window, finalized
    with the same avalanche mix (uint64 values)."""
    base = int(ROLL_BASE)
    out = []
    for i in range(len(data) - k + 1):
        h = 0
        for t in range(k):
            h = (h + data[i + t] * pow(base, t, 1 << 64)) & MASK
        out.append(int(fmix64(np.array([h], dtype=np.uint64))[0]))
    return out


def winnow_naive(hashes: list[int], w: int) -> list[int]:
    """Leftmost-min winnowing by explicit window scan."""
    n = len(hashes)
    if n == 0:
        return []
    if n <= w:
        return [min(range(n), key=lambda i: (hashes[i], i))]
    sel = set()
    for t in range(n - w + 1):
        window = hashes[t : t + w]
        m = min(window)
        sel.add(t + window.index(m))
    return sorted(sel)


def longest_common_run(a: bytes, b: bytes) -> int:
    """Length of the longest common contiguous byte run (difflib)."""
    sm = SequenceMatcher(None, a, b, autojunk=False)
    m = sm.find_longest_match(0, len(a), 0, len(b))
    return m.size

"""Test-corpus access and synthetic inputs.

The reference corpus lives read-only at /root/reference/test/ (bible.txt and
sqlite3.c are missing blobs in the mount — see BASELINE.md). Tests skip files
that are absent; synthetic generators cover the edge cases the reference
harness exercises (attic/map_experiment/test.c:198-217).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

REFERENCE_TEST_DIR = Path(os.environ.get(
    "SQZ_CORPUS_DIR", "/root/reference/test"))

CORPUS_FILES = [
    "bible.txt", "hhgttg.txt", "confucius.txt", "laozi.txt",
    "sqlite3.c", "arm64.elf", "x64.elf", "mandrill.bmp", "mandrill.png",
]


def available_corpus() -> list[Path]:
    return [REFERENCE_TEST_DIR / f for f in CORPUS_FILES
            if (REFERENCE_TEST_DIR / f).exists()]


def load(name: str) -> bytes:
    return (REFERENCE_TEST_DIR / name).read_bytes()


def zeros(n: int = 4096) -> bytes:
    return b"\x00" * n


def rle4(n: int = 4096) -> bytes:
    """4-byte repeating pattern — stresses overlapped backrefs."""
    return (b"\x01\x02\x03\x04" * ((n + 3) // 4))[:n]


def hello() -> bytes:
    return b"Hello World Hello.World Hello World"


def random_bytes(n: int, seed: int = 0) -> bytes:
    """Incompressible stress input."""
    return np.random.default_rng(seed).integers(
        0, 256, size=n, dtype=np.uint8).tobytes()


def texty(n: int, seed: int = 0) -> bytes:
    """Compressible pseudo-text with repeated words."""
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"squeeze", b"window", b"huffman"]
    parts = []
    size = 0
    # size counts a separator per word but join emits k-1 of them, so the
    # joined text is size-1 bytes: run until it covers n exactly
    while size - 1 < n:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w)
        size += len(w) + 1
    out = b" ".join(parts)[:n]
    assert len(out) == n
    return out

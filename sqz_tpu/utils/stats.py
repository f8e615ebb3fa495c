"""Compression telemetry — the reference's SQUEEZE_MAP_STATS equivalent
(src/sqz.c:567-588, 744-790; squeeze.h:397-408): per-model Shannon entropies,
literal/backref byte ratios, match-length and distance-bit histograms.
Computed from token streams / model tables, engine-agnostic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Iterable, Sequence

import numpy as np


def shannon_entropy(freq: Sequence[int], skip_singletons: bool = True) -> float:
    """Bits/symbol. The reference ignores freq<=1 slots (src/sqz.c:571-587)."""
    f = np.asarray(freq, dtype=np.float64)
    if skip_singletons:
        f = np.where(f > 1, f, 0.0)
    total = f.sum()
    if total <= 0:
        return 0.0
    p = f[f > 0] / total
    return float(-(p * np.log2(p)).sum())


@dataclass
class TokenStats:
    literal_bytes: int = 0
    backref_bytes: int = 0
    n_literals: int = 0
    n_matches: int = 0
    size_histogram: Dict[int, int] = field(default_factory=dict)
    distance_bits_histogram: Dict[int, int] = field(default_factory=dict)
    byte_freq: np.ndarray = field(
        default_factory=lambda: np.zeros(256, dtype=np.int64))

    @property
    def literal_percent(self) -> float:
        total = self.literal_bytes + self.backref_bytes
        return 100.0 * self.literal_bytes / total if total else 0.0

    @property
    def backref_percent(self) -> float:
        total = self.literal_bytes + self.backref_bytes
        return 100.0 * self.backref_bytes / total if total else 0.0

    def literal_entropy(self) -> float:
        return shannon_entropy(self.byte_freq)

    def report(self) -> str:
        lines = [
            f"literals: {self.literal_percent:.2f}% "
            f"back references: {self.backref_percent:.2f}%",
            f"literal byte entropy: {self.literal_entropy():.2f} bits",
            f"tokens: {self.n_literals} literals, {self.n_matches} matches",
        ]
        if self.distance_bits_histogram:
            total = sum(self.distance_bits_histogram.values())
            cum = 0.0
            for b in sorted(self.distance_bits_histogram):
                p = 100.0 * self.distance_bits_histogram[b] / total
                cum += p
                lines.append(f"distance_bits[{b:2d}]: {p:7.3f}% {cum:7.3f}%")
        return "\n".join(lines)


def analyze_tokens(tokens: Iterable) -> TokenStats:
    st = TokenStats()
    for tok in tokens:
        if tok[0] == "lit":
            st.n_literals += 1
            st.literal_bytes += 1
            st.byte_freq[tok[1]] += 1
        else:
            _, length, dist = tok
            st.n_matches += 1
            st.backref_bytes += length
            st.size_histogram[length] = st.size_histogram.get(length, 0) + 1
            bits = int(dist).bit_length()
            st.distance_bits_histogram[bits] = (
                st.distance_bits_histogram.get(bits, 0) + 1)
    return st

"""Differential tests: RefMap replica vs the reference's own map functions.

The reference's open-addressing match dictionary (src/sqz.c:66-186) is dead
code at reference HEAD (the map is force-cleared and map_best results are
discarded), so stream-level goldens cannot exercise it. Instead
tests/tools/map_harness.c compiles the UNMODIFIED src/sqz.c with its static
map_* entry points scripted from stdin, and every printed result — slot
indices (probe-order-sensitive), entry counts, chain/byte maxima, best-match
distance/size, lazy evictions, extension re-inserts — must match
sqz_tpu.oracle.refmap.RefMap line for line.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from sqz_tpu.oracle.refmap import RefMap, refmap_tokens
from sqz_tpu.utils import corpus

TOOLS = Path(__file__).parent / "tools"
REF = Path("/root/reference")


@pytest.fixture(scope="session")
def harness(tmp_path_factory):
    if not (REF / "src/sqz.c").exists() or shutil.which("gcc") is None:
        pytest.skip("reference mount or gcc unavailable")
    d = tmp_path_factory.mktemp("maph")
    exe = d / "map_harness"
    subprocess.run(
        ["gcc", "-std=c11", "-O2", "-Dstatic_assert=_Static_assert",
         f"-I{TOOLS}/shim", f"-I{REF}/inc",
         f"-DSQZ_SRC=\"{REF}/src/sqz.c\"",
         str(TOOLS / "map_harness.c"), "-o", str(exe), "-lm"],
        check=True, capture_output=True)
    return exe


def _run_ref(harness, tmp: Path, data: bytes, script: list[str]) -> list[str]:
    (tmp / "d.bin").write_bytes(data)
    r = subprocess.run([str(harness), str(tmp / "d.bin")],
                       input="\n".join(script) + "\n", text=True,
                       capture_output=True, check=True)
    # map_best's extension printf interleaves; keep only result lines
    return [ln for ln in r.stdout.splitlines() if ln.startswith("= ")]


def _run_replica(data: bytes, script: list[str]) -> list[str]:
    m = None
    out = []
    for ln in script:
        parts = ln.split()
        op, args = parts[0], [int(x) for x in parts[1:]]
        if op == "I":
            m = RefMap(data, args[0])
            out.append(f"= I {args[0]}")
        elif op == "P":
            r = m.put(args[0], args[1])
            out.append(f"= P {r} {m.entries} {m.max_chain} {m.max_bytes}")
        elif op == "G":
            out.append(f"= G {m.get(args[0], args[1])}")
        elif op == "B":
            dist, size = m.best(args[0], args[1], args[2])
            out.append(f"= B {dist} {size} {m.entries}")
        elif op == "R":
            m.remove(args[0])
            out.append(f"= R {m.entries}")
        elif op == "C":
            m.clear()
            out.append("= C")
    return out


def _check(harness, tmp, data: bytes, script: list[str]) -> None:
    assert _run_ref(harness, tmp, data, script) == _run_replica(data, script)


def test_scripted_random_ops(harness, tmp_path):
    """Random put/get/best mixes on text, several table sizes (probe order
    and the 75% fill cutoff are n-sensitive), including a tiny table
    driven to the fill cutoff. Mutating ops advance monotonically through
    the data — the reference asserts puts of an already-stored string
    happen at non-decreasing offsets (src/sqz.c:117, the encoder's
    forward-scan invariant), so a valid driver must too."""
    rng = np.random.default_rng(11)
    base = bytes(corpus.load("confucius.txt")[:8192])
    for n in (17 + 1, 97, 4096):
        script = [f"I {n}"]
        off = 0
        for _ in range(600):
            k = rng.integers(0, 12)
            off = min(off + int(rng.integers(0, 24)), len(base) - 300)
            if k < 5:
                script.append(f"P {off} {int(rng.integers(2, 40))}")
            elif k < 7:  # gets are read-only: any offset is fair game
                g = int(rng.integers(0, len(base) - 40))
                script.append(f"G {g} {int(rng.integers(2, 40))}")
            elif k < 11:
                win = int(rng.integers(64, 1 << 15))
                script.append(f"B {off} {int(rng.integers(2, 260))} {win}")
            else:
                script.append("C")
        _check(harness, tmp_path, base, script)


def test_scripted_eviction_and_removal(harness, tmp_path):
    """Tombstone semantics: explicit removes, lookups that probe THROUGH
    tombstones, lazy eviction (entry found at distance >= window is
    removed mid-walk), and the extension re-insert at the query offset.
    Data repeats with period 256, so position 512+k equals 768+k."""
    data = (b"abcdefgh" * 64) + bytes(range(256)) * 2
    script = ["I 31"]
    m = RefMap(data, 31)
    idx = []
    for off, ln in ((512, 3), (512, 4), (520, 3), (528, 3)):
        idx.append(m.put(off, ln))
        script.append(f"P {off} {ln}")
    assert len(set(idx)) == 4   # distinct strings -> distinct slots
    script += [f"R {idx[2]}",        # tombstone (520,3)
               "G 520 3",            # must miss via the tombstone
               "G 512 4", "G 512 3",  # still live
               # window 128 < distance 256: len-3 and len-4 entries at 512
               # are found and lazily evicted; best stays empty
               "B 768 40 128",
               "G 512 3", "G 512 4",  # both tombstoned by the eviction
               # re-insert (probes through tombstones to fresh slots)
               "P 512 3", "P 512 4",
               # full window: len-3 then len-4 hit, len-5 miss; the len-4
               # best extends to 40 bytes and re-inserts at offset 768
               "B 768 40 32768",
               "G 768 40"]            # the extension's re-insert
    _check(harness, tmp_path, data, script)


def test_encoder_loop_shapes(harness, tmp_path):
    """The exact op sequence refmap_tokens drives (best + put-on-match +
    bootstrap puts), replayed against the reference functions on real
    corpus data — covers extension re-inserts and nearer-occurrence
    updates at scale."""
    data = bytes(corpus.load("laozi.txt")[:4096])
    n = 1 << 12
    # replay the token-parse op stream through both sides
    m = RefMap(data, n)
    script = [f"I {n}"]
    i = 0
    while i < len(data):
        script.append(f"B {i} {len(data) - i} 32768")
        dist, size = m.best(i, len(data) - i, 1 << 15)
        if size <= 3 and dist.bit_length() > 3:
            size = 0
        if size >= 2:
            script.append(f"P {i} {size}")
            m.put(i, size)
            i += size
        else:
            if i >= 2:
                for ln in (2, 3, 4):
                    if i + ln - 1 < len(data):
                        script.append(f"P {i} {ln}")
                        m.put(i, ln)
            i += 1
    # replica window 1<<15 == harness window 32768: identical decisions
    _check(harness, tmp_path, data, script)


def test_refmap_tokens_valid_streams():
    """The opt-in refmap parse yields spec-valid tokens that decode."""
    from sqz_tpu.oracle.sqz4 import sqz4_encode_payload, sqz4_decode_payload
    data = bytes(corpus.load("confucius.txt")[:6144])
    toks = list(refmap_tokens(data, 1 << 15, map_n=1 << 12))
    # every match must be a verbatim earlier substring within the window
    pos = 0
    for t in toks:
        if t[0] == "match":
            _, ln, dist = t
            assert 2 <= ln <= 254 and 0 < dist < (1 << 15)
            src = data[pos - dist:pos - dist + ln]
            # overlapped copies replicate; compare byte-serially
            exp = bytes(data[pos - dist + k] if dist > k else src[k % dist]
                        for k in range(ln))
            assert data[pos:pos + ln] == exp[:ln]
            pos += ln
        else:
            pos += 1
    assert pos == len(data)
    blob = sqz4_encode_payload(data, 1 << 15, lz=True, tokens=toks)
    assert sqz4_decode_payload(blob, len(data)) == data
    # and it actually finds matches on text
    assert any(t[0] == "match" for t in toks)

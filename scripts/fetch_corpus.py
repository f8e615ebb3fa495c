#!/usr/bin/env python3
"""Fetch the reference test corpus (reference scripts/download.bat:1-42).

The read-only reference mount is missing test/bible.txt and test/sqlite3.c
(.MISSING_LARGE_BLOBS); this script re-fetches every corpus file into
test/ so the full BASELINE corpus configs can run. Gutenberg texts get the
license header/footer stripped the way the reference README describes
(reference README.md:163-168). Requires network egress (not available in
the build sandbox — run on a networked host).
"""

from __future__ import annotations

import sys
import urllib.request
from pathlib import Path

FILES = {
    # reference scripts/download.bat URLs
    "bible.txt": "https://www.gutenberg.org/cache/epub/10/pg10.txt",
    "confucius.txt": "https://www.gutenberg.org/cache/epub/3330/pg3330.txt",
    "laozi.txt": "https://www.gutenberg.org/cache/epub/24039/pg24039.txt",
    "hhgttg.txt": ("https://raw.githubusercontent.com/outerbounds/"
                   "hhgttg/main/hhgttg.txt"),
    "sqlite3.c": ("https://raw.githubusercontent.com/smparkes/sqlite/"
                  "master/sqlite3.c"),
    "mandrill.png": ("https://upload.wikimedia.org/wikipedia/commons/"
                     "c/c1/Wikipedia-sipi-image-db-mandrill-4.2.03.png"),
}

GUTENBERG_START = "*** START OF"
GUTENBERG_END = "*** END OF"


def strip_gutenberg(text: bytes) -> bytes:
    s = text.decode("utf-8", errors="replace")
    lo = s.find(GUTENBERG_START)
    if lo >= 0:
        lo = s.find("\n", lo) + 1
    else:
        lo = 0
    hi = s.find(GUTENBERG_END)
    if hi < 0:
        hi = len(s)
    return s[lo:hi].encode("utf-8")


def main() -> int:
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("test")
    dest.mkdir(parents=True, exist_ok=True)
    for name, url in FILES.items():
        out = dest / name
        if out.exists():
            print(f"have  {name}")
            continue
        print(f"fetch {name} <- {url}")
        data = urllib.request.urlopen(url, timeout=60).read()
        if name.endswith(".txt") and "gutenberg" in url:
            data = strip_gutenberg(data)
        out.write_bytes(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

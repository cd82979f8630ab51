"""Measure textual similarity of repo files vs the reference tree.

Usage: python tools/simcheck.py [file ...]
Reports difflib.SequenceMatcher ratio and line-set overlap against the
most similar same-named file under /root/reference.
"""

from __future__ import annotations

import difflib
import os
import sys

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm_lines(text: str) -> list[str]:
    out = []
    for ln in text.splitlines():
        s = ln.strip()
        if s:
            out.append(s)
    return out


def find_ref(name: str) -> list[str]:
    hits = []
    for root, _dirs, files in os.walk(REF):
        if "/tests" in root or "/.git" in root:
            continue
        for f in files:
            if f == name:
                hits.append(os.path.join(root, f))
    return hits


def compare(repo_path: str) -> tuple[float, float, str]:
    name = os.path.basename(repo_path)
    with open(repo_path) as f:
        mine = f.read()
    best = (0.0, 0.0, "")
    for ref_path in find_ref(name):
        with open(ref_path) as f:
            ref = f.read()
        a, b = _norm_lines(mine), _norm_lines(ref)
        ratio = difflib.SequenceMatcher(None, a, b).ratio()
        sa, sb = set(a), set(b)
        overlap = len(sa & sb) / max(len(sa), 1)
        if ratio > best[0]:
            best = (ratio, overlap, ref_path)
    return best


def main() -> None:
    targets = sys.argv[1:]
    if not targets:
        targets = []
        for root, _dirs, files in os.walk(
            os.path.join(REPO, "pulser_tpu")
        ):
            for f in files:
                if f.endswith(".py"):
                    targets.append(os.path.join(root, f))
    rows = []
    for t in sorted(targets):
        ratio, overlap, ref_path = compare(t)
        rows.append((ratio, overlap, os.path.relpath(t, REPO), ref_path))
    rows.sort(reverse=True)
    for ratio, overlap, path, ref_path in rows:
        flag = " <<<" if ratio > 0.55 else ""
        print(
            f"{ratio:.2f}  {overlap:.2f}  {path}"
            f"  ({os.path.relpath(ref_path, REF) if ref_path else '-'})"
            f"{flag}"
        )


if __name__ == "__main__":
    main()

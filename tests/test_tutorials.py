"""Executes every narrated tutorial end-to-end (CI acceptance).

Mirrors the reference's nbmake practice (its tutorials run as tests
in CI; ``dev_requirements.txt``): each literate source in
``docs/tutorials/src`` is executed cell by cell — assertions inside
the tutorials are the acceptance criteria — and must produce its
markdown and at least one rendered figure.
"""

from __future__ import annotations

import os

import pytest

from tools import build_tutorials

SRC = build_tutorials.SRC
NAMES = sorted(
    os.path.splitext(f)[0]
    for f in os.listdir(SRC)
    if f.endswith(".py")
)


def test_tutorials_present():
    assert len(NAMES) >= 6, NAMES


@pytest.mark.parametrize("name", NAMES)
def test_tutorial_executes(name, tmp_path, monkeypatch):
    monkeypatch.setattr(
        build_tutorials, "OUT", str(tmp_path)
    )
    monkeypatch.setattr(
        build_tutorials, "FIGS", str(tmp_path / "figs")
    )
    out = build_tutorials.run_tutorial(name)
    assert os.path.exists(out)
    with open(out) as f:
        md = f.read()
    assert "```python" in md
    figs = os.listdir(tmp_path / "figs")
    assert figs, "tutorial produced no figures"


def test_committed_outputs_current():
    """The committed markdown/figures exist for every tutorial (the
    builder regenerates them; this guards against adding a source
    without committing its rendered output)."""
    for name in NAMES:
        md = os.path.join(build_tutorials.OUT, name + ".md")
        assert os.path.exists(md), f"run tools/build_tutorials.py ({name})"

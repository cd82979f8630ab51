"""Executes the literate tutorial sources into narrated markdown.

Each tutorial in ``docs/tutorials/src/*.py`` is a py-percent script
(the jupytext cell convention the reference's notebook tooling also
understands): ``# %% [markdown]`` cells hold narration as comments,
``# %%`` cells hold code. This builder runs every code cell in one
namespace, captures its stdout and any matplotlib figures, and emits
``docs/tutorials/<name>.md`` interleaving narration, code, printed
output and figure links — the executed-notebook practice (the
reference runs its tutorials under nbmake in CI;
``dev_requirements.txt``) without a notebook kernel in the loop.

Usage:
    python tools/build_tutorials.py [name ...]   # default: all

The test suite executes the same cells (tests/test_tutorials.py), so
every committed tutorial is a passing end-to-end run.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "docs", "tutorials", "src")
OUT = os.path.join(ROOT, "docs", "tutorials")
FIGS = os.path.join(OUT, "figs")

_CELL = re.compile(r"^# %%(.*)$")


def parse_cells(path: str) -> list[tuple[str, str]]:
    """Splits a py-percent script into (kind, text) cells.

    kind is "markdown" or "code"; markdown text has the leading
    ``# `` comment markers stripped.
    """
    cells: list[tuple[str, str]] = []
    kind = None
    lines: list[str] = []

    def flush() -> None:
        nonlocal lines
        if kind is not None and any(ln.strip() for ln in lines):
            text = "\n".join(lines).strip("\n")
            if kind == "markdown":
                text = "\n".join(
                    ln[2:] if ln.startswith("# ") else ln.lstrip("#")
                    for ln in text.splitlines()
                )
            cells.append((kind, text))
        lines = []

    with open(path) as f:
        for raw in f.read().splitlines():
            m = _CELL.match(raw)
            if m:
                flush()
                kind = (
                    "markdown"
                    if "[markdown]" in m.group(1)
                    else "code"
                )
            elif kind is not None:
                lines.append(raw)
    flush()
    return cells


def run_tutorial(name: str) -> str:
    """Executes one tutorial and returns its rendered markdown."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(SRC, name + ".py")
    cells = parse_cells(path)
    os.makedirs(FIGS, exist_ok=True)
    ns: dict = {"__name__": f"tutorial_{name}"}
    parts: list[str] = []
    fig_idx = 0
    for kind, text in cells:
        if kind == "markdown":
            parts.append(text)
            continue
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                exec(  # noqa: S102 — our own tutorial sources
                    compile(text, f"{name}.py", "exec"), ns
                )
        except Exception:
            traceback.print_exc()
            raise RuntimeError(
                f"tutorial {name} failed in cell:\n{text}"
            ) from None
        parts.append(f"```python\n{text}\n```")
        out = buf.getvalue().rstrip()
        if out:
            parts.append(f"```\n{out}\n```")
        for num in plt.get_fignums():
            fig_idx += 1
            fname = f"{name}_{fig_idx:02d}.png"
            plt.figure(num).savefig(
                os.path.join(FIGS, fname),
                dpi=110,
                bbox_inches="tight",
            )
            parts.append(f"![{name} figure {fig_idx}](figs/{fname})")
        plt.close("all")
    md = "\n\n".join(parts) + "\n"
    out_path = os.path.join(OUT, name + ".md")
    with open(out_path, "w") as f:
        f.write(md)
    return out_path


def main() -> None:
    sys.path.insert(0, ROOT)
    argv = sys.argv[1:]
    if "--tpu" in argv:
        argv.remove("--tpu")
    else:
        # Tutorials are small (≤ 9 atoms); CPU runs them in seconds
        # with no backend warmup, and the committed outputs stay
        # deterministic. (The env var is overridden by the TPU
        # plugin in some images; the config flag is authoritative.)
        import jax

        jax.config.update("jax_platforms", "cpu")
    names = argv or sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(SRC)
        if f.endswith(".py")
    )
    for name in names:
        print(f"building {name} ...", flush=True)
        print("  ->", run_tutorial(name), flush=True)


if __name__ == "__main__":
    main()

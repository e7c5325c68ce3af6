"""Extract code cells from a Jupyter notebook into Python files.

Counterpart of the reference's ``convert_notebook.py:13-65`` (which seeded
its package from EE4002R_2025.ipynb): parses an .ipynb, writes each code
cell to ``cell_NNN.py`` under the output directory, and an ``__init__.py``
listing them.

Usage:  python tools/convert_notebook.py notebook.ipynb out_dir/
"""
from __future__ import annotations

import json
import sys
from pathlib import Path


def extract_code_cells(notebook_path: str | Path) -> list[str]:
    nb = json.loads(Path(notebook_path).read_text())
    return ["".join(c["source"]) for c in nb.get("cells", []) if c.get("cell_type") == "code"]


def create_directory_structure(out_dir: str | Path, cells: list[str]) -> list[Path]:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for i, src in enumerate(cells):
        p = out / f"cell_{i:03d}.py"
        p.write_text(src if src.endswith("\n") else src + "\n")
        written.append(p)
    (out / "__init__.py").write_text(
        "# extracted from notebook; cells:\n"
        + "".join(f"# {p.name}\n" for p in written)
    )
    return written


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    cells = extract_code_cells(sys.argv[1])
    written = create_directory_structure(sys.argv[2], cells)
    print(f"wrote {len(written)} code cells to {sys.argv[2]}")


if __name__ == "__main__":
    main()

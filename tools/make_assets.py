"""Regenerate the 5G NR base-graph data assets shipped with ldpc_tpu.

The shift-coefficient tables are standard 5G NR LDPC base-graph data
(TS 38.212 BG2 reduced mod Z).  The same matrices are shipped by the reference
repo as whitespace text under ``5G LDPC CODES/`` (see SURVEY.md §2 row 36);
here they are stored as JSON so they are unambiguous data assets.

Usage:  python tools/make_assets.py /root/reference/"5G LDPC CODES" ldpc_tpu/codes/data
"""
from __future__ import annotations

import json
import pathlib
import sys


def parse_shift_table(path: pathlib.Path) -> list[list[int]]:
    rows = []
    for line in path.read_text().splitlines():
        vals = line.split()
        if vals:
            rows.append([int(float(v)) for v in vals])
    width = {len(r) for r in rows}
    assert len(width) == 1, f"ragged rows in {path}: {width}"
    return rows


def main() -> None:
    src = pathlib.Path(sys.argv[1])
    dst = pathlib.Path(sys.argv[2])
    dst.mkdir(parents=True, exist_ok=True)
    for txt in sorted(src.glob("*.txt")):
        table = parse_shift_table(txt)
        name = txt.stem.lower()  # e.g. NR_2_0_4 -> nr_2_0_4
        out = dst / f"{name}.json"
        payload = {
            "name": name,
            "rows": len(table),
            "cols": len(table[0]),
            "description": "5G NR LDPC base graph shift coefficients (-1 = no edge)",
            "shifts": table,
        }
        out.write_text(json.dumps(payload))
        print(f"wrote {out} ({len(table)}x{len(table[0])})")


if __name__ == "__main__":
    main()

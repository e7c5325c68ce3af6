"""Native C++ graph builder: exact agreement with the numpy reference
implementation, and a speed sanity check on a large lifted graph."""
import time

import numpy as np
import pytest

from ldpc_tpu.codes import edge_layout_from_H, expand_base_matrix, get_base_graph, load_base_matrix
from ldpc_tpu.runtime import (
    edge_layout_from_H_native,
    load_base_matrix_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no native toolchain")


def test_parse_base_matrix_matches_python(tmp_path):
    p = tmp_path / "bg.txt"
    p.write_text("  0  1 -1\n -1  0  2 \n")
    bg_native = load_base_matrix_native(p)
    bg_py = load_base_matrix(p)
    np.testing.assert_array_equal(bg_native.shifts, bg_py.shifts)


def test_parse_shipped_assets_roundtrip(tmp_path):
    bg = get_base_graph("nr_2_0_32")
    p = tmp_path / "nr.txt"
    p.write_text("\n".join(" ".join(str(v) for v in row) for row in bg.shifts))
    bg2 = load_base_matrix_native(p)
    np.testing.assert_array_equal(bg2.shifts, bg.shifts)


@pytest.mark.parametrize("name,Z", [("toy_4x8", 4), ("nr_2_0_4", 4), ("nr_2_0_32", 16)])
def test_edge_layout_matches_python(name, Z):
    H = expand_base_matrix(get_base_graph(name), Z)
    a = edge_layout_from_H(H)
    b = edge_layout_from_H_native(H)
    np.testing.assert_array_equal(a.edge_var, b.edge_var)
    np.testing.assert_array_equal(a.edge_check, b.edge_check)
    np.testing.assert_array_equal(a.check_nbr, b.check_nbr)
    np.testing.assert_array_equal(a.var_nbr, b.var_nbr)


def test_native_is_faster_on_large_graph():
    H = expand_base_matrix(get_base_graph("nr_2_0_32"), 64)  # 12608 edges
    edge_layout_from_H_native(H)  # warm (may compile the .so)

    def best_of(fn, reps=2):
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(H)
            times.append(time.time() - t0)
        return min(times)

    t_py = best_of(edge_layout_from_H)
    t_native = best_of(edge_layout_from_H_native)
    assert t_native < t_py


def test_parse_errors(tmp_path):
    from ldpc_tpu.runtime import load_base_matrix_native

    ragged = tmp_path / "ragged.txt"
    ragged.write_text("0 1\n2\n")
    with pytest.raises(ValueError):
        load_base_matrix_native(ragged)
    with pytest.raises(ValueError):
        load_base_matrix_native(tmp_path / "missing.txt")

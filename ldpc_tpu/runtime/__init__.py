"""Native runtime components (C++ via ctypes, with Python fallbacks)."""

from ldpc_tpu.runtime.native import (  # noqa: F401
    edge_layout_from_H_native,
    load_base_matrix_native,
    native_available,
)

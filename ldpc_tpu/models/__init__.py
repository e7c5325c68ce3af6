"""Decoder model families.

Maps to the reference inventory (SURVEY.md §2):

- rows 10-11: :mod:`ldpc_tpu.models.classical` (BP, scaled min-sum)
- rows 16-17: :mod:`ldpc_tpu.models.neural_min_sum` (standard + tied)
- row 18:     :mod:`ldpc_tpu.models.gnn` (node-centered GNN, base-graph variant)
- rows 19-24: :mod:`ldpc_tpu.models.message_gnn` (message-centered GNN family)
"""

from ldpc_tpu.models.classical import (  # noqa: F401
    BeliefPropagationDecoder,
    DecodeResult,
    MinSumScaledDecoder,
    decode_bp,
    decode_min_sum,
)
from ldpc_tpu.models.gnn import (  # noqa: F401
    GNNLDPCDecoder,
    make_base_graph_gnn_decoder,
    make_gnn_decoder,
)
from ldpc_tpu.models.message_gnn import (  # noqa: F401
    MessageGNNDecoder,
    MessageGNNLayer,
    create_corrected_minsum_gnn_decoder,
    create_custom_check_message_gnn_decoder,
    create_custom_minsum_message_gnn_decoder,
    create_custom_variable_message_gnn_decoder,
    create_message_gnn_decoder,
)
from ldpc_tpu.models.neural_min_sum import (  # noqa: F401
    NeuralMinSumDecoder,
    make_standard_decoder,
    make_tied_decoder,
)

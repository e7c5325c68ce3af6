"""ldpc_tpu — a TPU-native 5G LDPC neural-decoding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
BananaFalls/LDPC-NeuralNetwork-Decoder (reference layer map in /root/repo/SURVEY.md):

- 5G NR base-graph registry + QC lifting           -> :mod:`ldpc_tpu.codes`
- BPSK/QPSK + AWGN channel + LLR demodulation      -> :mod:`ldpc_tpu.utils.channel`
- Classical BP / scaled min-sum decoders           -> :mod:`ldpc_tpu.models`
- Neural min-sum (per-edge & tied weights)         -> :mod:`ldpc_tpu.models.neural_min_sum`
- Message-centered GNN decoder family              -> :mod:`ldpc_tpu.models.message_gnn`
- Training / Monte-Carlo BER-FER evaluation        -> :mod:`ldpc_tpu.training`
- SPMD data-parallel scaling over TPU meshes       -> :mod:`ldpc_tpu.parallel`
- Pallas TPU kernels for the message-passing core  -> :mod:`ldpc_tpu.ops`

Unlike the reference (single-device PyTorch with per-edge Python loops), every
decoder here is a pure function compiled once by XLA: fixed shapes, `lax.scan`
decode loops, circulant-roll message permutations derived from the quasi-cyclic
structure, and batch/SNR sharding over `jax.sharding.Mesh` for multi-chip runs.
"""

__version__ = "0.1.0"

from ldpc_tpu.codes import (  # noqa: F401
    BaseGraph,
    load_base_matrix,
    get_base_graph,
    expand_base_matrix,
    EdgeLayout,
    QCLayout,
)

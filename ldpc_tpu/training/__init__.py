"""Training and evaluation harness."""

from ldpc_tpu.training.trainer import LDPCDecoderTrainer  # noqa: F401

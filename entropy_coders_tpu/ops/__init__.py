"""TPU compute kernels (JAX/XLA, with Pallas variants for the hot paths)."""

from .coder import decode_interleaved, encode_interleaved

__all__ = ["decode_interleaved", "encode_interleaved"]

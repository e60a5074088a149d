"""Pallas TPU kernels.

paged_attention.py — fused paged decode attention (the reference's
decoder_masked_multihead_attention rebuilt for TPU).
quant_matmul.py — packed-int4 matmul: nibbles unpack INSIDE the dot
pipeline for true 4-bit HBM traffic (the reference's gemm_s_f16 role;
every earlier standalone-unpack attempt measured 10x slower — details
in ops/linear.py's docstring).
"""
import jax


def available() -> bool:
    """Pallas kernels compile only on a real TPU backend (CPU tests use
    interpret mode explicitly)."""
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:  # pragma: no cover
        return False


# kept for engine gating
PAGED_ATTENTION_AVAILABLE = property  # replaced below at import time


def _init():
    global PAGED_ATTENTION_AVAILABLE
    PAGED_ATTENTION_AVAILABLE = available()


_init()

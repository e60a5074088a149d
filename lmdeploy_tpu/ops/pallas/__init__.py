"""Pallas TPU kernels.

paged_attention.py — fused paged decode attention (the reference's
decoder_masked_multihead_attention rebuilt for TPU).  The W4A16 matmul
deliberately has NO Pallas kernel: XLA's convert-fused dot measured 10x
faster than anything expressible in Mosaic on this stack (details in
ops/linear.py's docstring).
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

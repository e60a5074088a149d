"""Pallas TPU kernels (decode attention, prefill flash attention, W4A16
matmul).  Modules register themselves here; until then the XLA reference
paths in ops/attention.py and ops/linear.py are used."""


def paged_attention(*args, **kwargs):  # pragma: no cover - replaced below
    raise NotImplementedError(
        'Pallas paged attention not yet wired; use use_pallas_attn=False')

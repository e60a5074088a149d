"""Linear layers: bf16 dense and W4A16 grouped-quantized dense.

TPU-native replacement for the reference's LlamaLinear dispatch
(src/turbomind/models/llama/LlamaLinear.h:29-81: fp16 -> cublas,
kINT4 -> GemmS4F16 fused dequant GEMM, gemm_s4_f16.cu).

The reference needs a hand-written kernel zoo because CUDA tensor cores
cannot consume int4 directly.  On this TPU stack the design space was
measured exhaustively (v5e, serialized in-jit timing):

- bf16 dot:                      900 GB/s of weight traffic (HBM peak)
- uint8 -> bf16 convert fused into dot:  623 GB/s of u8 traffic
- uint4 via bitcast_convert_type: 34 GB/s (XLA materializes + relayouts
  the sub-byte buffer), u4 jit args/constants: broken/UNIMPLEMENTED in
  this jax build, STANDALONE Pallas/Mosaic nibble unpack: 58 GB/s (the
  2x-sized unpacked buffer dominates).
- IN-DOT Pallas nibble unpack (ops/pallas/quant_matmul.py) with full-N
  kernel tiles: 900 GB/s EFFECTIVE on packed bytes — true sub-byte
  residency at HBM speed (round 4, .r4/kernel_tune3.log).  The same
  stacked-layer kernel also kills the scan-xs weight-slice copies that
  made XLA's byte path stream weights ~2x.

So the DEFAULT W4A16 residency on TPU is the nibble-packed
:class:`PackedInt4Weight` riding that kernel (engine packs at startup).
:class:`QuantizedWeight` — ONE int4 VALUE PER uint8 BYTE (`qvals`) — is
the load/compute-regime form: XLA prefill/large-M paths consume it, CPU
tests default to it (interpret-mode Pallas is slow), and unpackable
shapes (odd group count, unaligned N) stay on it.  The on-disk
workspace format stays truly 4-bit packed (pack_int4/unpack_int4 at
save/load).

Per-group asymmetric dequant w = (q - z) * s is algebraically moved OUT
of the weight path:  x @ w = sum_g (x_g @ q_g) * s_g - rowsum_g(x)@(s*z)
The zero-point term is one tiny [M,G]@[G,N] dot.  The scale term uses
one of two regimes picked by static M:
  * decode (small M): block-diagonal activations [M*G, K] turn the
    per-group partial sums into ONE convert-fused dot; the per-group
    rescale touches only [M, G, N].
  * prefill (large M): dequantize to bf16 once (broadcast scales, no
    repeat materialization) and run a plain MXU dot — compute-bound at
    large M anyway.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _w4a8_enabled() -> bool:
    """Opt-in W4A8 path (int8 MXU + per-token activation quant), env
    flag LMDEPLOY_TPU_W4A8=1.

    MEASURED VERDICT (v5e, jax 0.9.0): the int8 MXU dot streams ~19%
    more weight bandwidth than the u8->bf16 convert dot in isolation
    (397 vs 334 GB/s), but ANY jit containing the grouped int8
    dot_general at 7B shapes hangs XLA compilation indefinitely (>240s
    for one matmul).  Kept for newer runtimes; numerics are validated on
    CPU (tests/test_ops.py)."""
    import os
    return os.environ.get('LMDEPLOY_TPU_W4A8', '0') == '1'


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """W4A16 weight: [K, N] int4 values stored one-per-byte + per-group
    asymmetric qparams (see module docstring for why not bit-packed)."""
    qvals: jnp.ndarray    # uint8 [K, N] values 0..15 ([L, K, N] stacked)
    scales: jnp.ndarray   # [K//group, N] float
    zeros: jnp.ndarray    # [K//group, N] float (zero-point in q domain)

    @property
    def k(self) -> int:
        return self.qvals.shape[-2]

    @property
    def n(self) -> int:
        return self.qvals.shape[-1]

    @property
    def group_size(self) -> int:
        return self.k // self.scales.shape[-2]


def pack_int4(q: np.ndarray) -> np.ndarray:
    """Pack [K, N] uint4 values (0..15) into uint8 [K, N//2] for the
    on-disk workspace format; byte [k, n'] holds columns 2n' (low nibble)
    and 2n'+1 (high)."""
    assert q.shape[-1] % 2 == 0
    lo = q[..., 0::2].astype(np.uint8)
    hi = q[..., 1::2].astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_int4` -> uint8 values 0..15, shape [K, N]."""
    packed = np.asarray(packed)
    out = np.empty((*packed.shape[:-1], packed.shape[-1] * 2), np.uint8)
    out[..., 0::2] = packed & 0xF
    out[..., 1::2] = packed >> 4
    return out


def quantize_weight_int4(w, group_size: int = 128) -> QuantizedWeight:
    """Per-group asymmetric min/max int4 quantization of a [K, N] weight.

    Matches the AWQ packing math (reference: lmdeploy/lite/quantization/
    weight/quantizer.py): q = clamp(round(w/s) + z, 0, 15),
    s = (max-min)/15, z = round(-min/s).
    """
    w = np.asarray(w, np.float32)
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    g = w.reshape(k // group_size, group_size, n)
    gmax = g.max(axis=1)
    gmin = g.min(axis=1)
    scales = np.maximum((gmax - gmin) / 15.0, 1e-8)
    zeros = np.clip(np.round(-gmin / scales), 0, 15)
    q = np.clip(np.round(g / scales[:, None, :]) + zeros[:, None, :], 0, 15)
    q = q.reshape(k, n).astype(np.uint8)
    return QuantizedWeight(
        qvals=jnp.asarray(q),
        scales=jnp.asarray(scales, jnp.bfloat16),
        zeros=jnp.asarray(zeros, jnp.bfloat16),
    )


def dequantize(qw: QuantizedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the bf16 weight (testing / prefill path). Broadcast via
    the [G, group, N] view — no repeat materialization."""
    qb = qw.qvals.astype(jnp.bfloat16)
    k, n = qb.shape
    g = qw.scales.shape[-2]
    s = qw.scales.astype(jnp.float32)[:, None, :]
    z = qw.zeros.astype(jnp.float32)[:, None, :]
    w = (qb.reshape(g, k // g, n).astype(jnp.float32) - z) * s
    return w.reshape(k, n).astype(dtype)


def quant_matmul(x2: jnp.ndarray, qw: QuantizedWeight) -> jnp.ndarray:
    """x2 [M, K] @ dequant(qw) -> [M, N] f32.

    Batched-over-groups dot: [G, M, group] x [G, group, N] -> [G, M, N],
    rescaled per group and summed — exact FLOPs, one weight pass, and the
    u8->bf16 convert stays fused into the dot (measured 72us for the 7B
    qkv shape at M=4 vs 76us for an unscaled plain dot)."""
    m, k = x2.shape
    g = qw.scales.shape[-2]
    group = k // g
    x2 = x2.astype(jnp.bfloat16)
    s = qw.scales.astype(jnp.float32)
    sz = s * qw.zeros.astype(jnp.float32)

    qb = qw.qvals.reshape(g, group, -1).astype(jnp.bfloat16)
    xg = x2.reshape(m, g, group).transpose(1, 0, 2)        # [G, M, group]
    # bf16 partials halve the [G, M, N] rescale traffic; the rounding is
    # ~2^-8 relative — far below the int4 quantization error itself.
    dots = jax.lax.dot_general(xg, qb, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.bfloat16)
    out = jnp.einsum('gmn,gn->mn', dots, s,
                     preferred_element_type=jnp.float32)
    # zero-point term: rowsum per group @ (s * z)
    sums = jnp.sum(x2.reshape(m, g, group).astype(jnp.float32), axis=2)
    out = out - jnp.dot(sums, sz, preferred_element_type=jnp.float32)
    return out


def quant_matmul_a8(x2: jnp.ndarray, qw: QuantizedWeight) -> jnp.ndarray:
    """W4A8 variant of :func:`quant_matmul`: per-token dynamic int8
    activation quantization feeding the int8 MXU path (measured ~19%
    more weight bandwidth than the u8->bf16 convert dot on v5e).

    The reference's analogue is gemm_s4_f16's in-register dequant into
    fp16 tensor cores (common.h:115-156); on TPU the int8 MXU consumes
    the byte-stored qvals directly and only the [M, G, N] partial-sum
    rescale runs in float.  x ~= sx * xq (per-token sx) makes the group
    dot exact in int32 (128 * 127 * 15 < 2^24), so the only added error
    is the activation rounding — standard W4A8.
    """
    m, k = x2.shape
    g = qw.scales.shape[-2]
    group = k // g
    x2 = x2.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x2), axis=1, keepdims=True),
                     1e-8) / 127.0                     # [M, 1]
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    s = qw.scales.astype(jnp.float32)
    sz = s * qw.zeros.astype(jnp.float32)

    qb = qw.qvals.reshape(g, group, -1).astype(jnp.int8)
    xg = xq.reshape(m, g, group).transpose(1, 0, 2)    # [G, M, group]
    dots = jax.lax.dot_general(xg, qb, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    out = jnp.einsum('gmn,gn->mn', dots.astype(jnp.bfloat16),
                     s.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = out * sx
    # zero-point term from the ORIGINAL activations (exact, no A-quant)
    sums = jnp.sum(x2.reshape(m, g, group), axis=2)
    out = out - jnp.dot(sums, sz, preferred_element_type=jnp.float32)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedInt4Weight:
    """TRUE sub-byte W4A16 residency: one uint8 byte holds TWO int4
    values (``pack_nibbles`` half-split layout), stacked over layers.
    The reference streams 4-bit packed weights into an in-register
    dequant GEMM (gemm_s_f16/common.h:115-156); here the Pallas kernel
    ops/pallas/quant_matmul.py plays that role — HBM traffic is half of
    :class:`QuantizedWeight`'s byte-per-int4 and weight residency halves.

    ``scales`` carries a unit sublane dim ([L, G, 1, N]) PRE-SHAPED for
    the kernel's block spec: reshaping inside the layer scan relayouts
    the full array every loop iteration (measured ~half the decode step,
    .r4/trace_packed.log — XLA does not hoist the copy).
    """
    packed: jnp.ndarray   # uint8 [L, K/2, N]
    scales: jnp.ndarray   # [L, G, 1, N] float
    sz: jnp.ndarray       # [L, G, N] float — scales * zeros, precomputed

    @property
    def k(self) -> int:
        return self.packed.shape[-2] * 2

    @property
    def n(self) -> int:
        return self.packed.shape[-1]


def pack_quantized(qw: QuantizedWeight) -> PackedInt4Weight:
    """Byte-per-int4 [L?, K, N] -> nibble-packed [L?, K/2, N] residency.
    Device-resident qvals pack ON DEVICE (pack_nibbles dispatches on the
    array type) — np.asarray here stalled engine startup for many
    minutes dragging ~3.4 GB of 7B qvals through the chip tunnel."""
    from .pallas.quant_matmul import pack_nibbles
    q = qw.qvals
    if not isinstance(q, jax.Array):
        q = np.asarray(q, np.uint8)
    if q.ndim == 2:
        q = q[None]
    s = jnp.asarray(qw.scales)
    z = jnp.asarray(qw.zeros)
    if s.ndim == 2:
        s, z = s[None], z[None]
    return PackedInt4Weight(
        packed=jnp.asarray(pack_nibbles(q)),
        scales=s[:, :, None, :],
        sz=(s.astype(jnp.float32)
            * z.astype(jnp.float32)).astype(s.dtype),
    )


# static-M threshold where the packed path switches from the Pallas
# decode kernel to the XLA unpack-into-group-dot formulation (prefill is
# compute-bound at large M; the kernel's tiny-M MXU tiles stop paying)
_PACKED_PALLAS_MAX_M = 64

# measured block_n winners for the packed kernel, keyed
# "K:N:M-bucket" (M-bucket = next power of two).  The reference ships a
# ~17-shape kernel zoo picked by Estimate/Measure (gemm_s4_f16.cu:
# 73-206); here the one tunable is the kernel's N tile.  Populated from
# the workspace's mm_tune.json (benchmark/autotune.py --packed) via
# :func:`set_tune_table` at engine start.
_TUNE_TABLE: dict = {}


def set_tune_table(table: dict) -> None:
    """Install measured packed-kernel tile winners (workspace
    mm_tune.json, the repo's gemm_config.in equivalent)."""
    _TUNE_TABLE.clear()
    _TUNE_TABLE.update(table or {})


def _m_bucket(m: int) -> int:
    b = 1
    while b < m:
        b *= 2
    return b


def tune_key(k: int, n: int, m: int) -> str:
    return f'{k}:{n}:{_m_bucket(m)}'


def _tuned_block_n(m: int, k: int, n: int):
    """Measured tile override, else None -> the kernel's VMEM-budget
    auto pick (full-N rows when they fit — measured 900 GB/s effective
    vs 88.7 at the old bn=256/512 defaults, .r4/kernel_tune3.log)."""
    v = _TUNE_TABLE.get(tune_key(k, n, m))
    return int(v) if v is not None else None


def _packed_prefill_kernel() -> bool:
    """Large-M (prefill) regime of the packed path: 1 = the M-blocked
    Pallas kernel (one true-4-bit weight pass, MXU-bound), 0 = XLA
    unpack-to-bf16 + plain dot (the weight materializes at ~4.5
    bytes/value of traffic per chunk).

    DEFAULT ON — healthy-chip A/B (v5e, .r5/prefill_tput, 2026-08-20,
    512-token bucket, 500-token prompts, 3 repeats, zero fails):
    kernel 4026.8 tok/s vs XLA 2156.1 (1.87x), and the r4 scoped-VMEM
    compile OOM is fixed by the M-grid budget model + bm-halving tile
    choice (quant_matmul._auto_block_n/_choose_tiles, unit-tested
    against the known-OOM [512, 12288] shape).  Override:
    LMDEPLOY_TPU_PACKED_PREFILL=0 restores the XLA path."""
    import os
    return os.environ.get('LMDEPLOY_TPU_PACKED_PREFILL', '1') == '1'


def quant_matmul_packed(x2: jnp.ndarray, pw: PackedInt4Weight, layer,
                        *, interpret: bool = False) -> jnp.ndarray:
    """x2 [M, K] @ dequant(pw[layer]) -> [M, N] f32, true 4-bit HBM
    traffic.  Scale term in-kernel per group; the asymmetric zero-point
    term is the same algebraic rowsum dot as :func:`quant_matmul`."""
    from .pallas.quant_matmul import packed_int4_matmul, unpack_nibbles_jax
    m, k = x2.shape
    g = pw.scales.shape[1]
    group = k // g
    if m <= _PACKED_PALLAS_MAX_M or _packed_prefill_kernel():
        out = packed_int4_matmul(x2, pw.packed, pw.scales, layer,
                                 block_n=_tuned_block_n(m, k, pw.n),
                                 interpret=interpret)
        sums = jnp.sum(x2.astype(jnp.float32).reshape(m, g, group), axis=2)
        sz = jax.lax.dynamic_index_in_dim(pw.sz, layer, 0, keepdims=False)
        return out - jnp.dot(sums, sz.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
    # XLA large-M fallback: unpack + dequantize once, plain MXU dot;
    # with sz = s*z in hand the zero-point folds into the dequant, so
    # no algebraic rowsum term is needed here
    p = jax.lax.dynamic_index_in_dim(pw.packed, layer, 0, keepdims=False)
    s = jax.lax.dynamic_index_in_dim(pw.scales, layer, 0,
                                     keepdims=False)       # [G, 1, N]
    sz = jax.lax.dynamic_index_in_dim(pw.sz, layer, 0, keepdims=False)
    qb = unpack_nibbles_jax(p).reshape(g, group, -1).astype(jnp.float32)
    w = (qb * s.astype(jnp.float32)
         - sz.astype(jnp.float32)[:, None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(x2.astype(jnp.bfloat16),
                               w.reshape(k, -1),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def quant_matmul_dequant(x2: jnp.ndarray, qw: QuantizedWeight) -> jnp.ndarray:
    """Prefill (large-M) regime: dequantize the weight once to bf16 and
    run a plain MXU dot.  At big M the matmul is compute-bound, so the
    extra [K, N] bf16 materialization amortizes over many rows, while the
    batched-group formulation's [G, M, N] partial sums GROW with M.  The
    reference keeps a kernel zoo + Measure autotune for the same reason
    (gemm_s4_f16.cu:73-206); here the regime flips on a measured M
    threshold (see _DEQUANT_MIN_M)."""
    w = dequantize(qw, jnp.bfloat16)
    return jax.lax.dot_general(x2.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dequant_min_m() -> int:
    """Static-M threshold where the dequant regime takes over.

    MEASURED on the live chip (v5e; two campaigns of benchmark/autotune.py
    --mm-regime over all five 7B GEMM shapes, serialized fori loops):

        2026-08-17:  M=4   group  8.69 ms   dequant  9.89 ms -> group (+14%)
                     M=16  group 11.54 ms   dequant 11.06 ms -> dequant (+4%)
        2026-08-18:  M=32  group 41.6 ms    dequant 30.5 ms  -> dequant (1.36x)
                     M=64  group 54.2 ms    dequant 41.2 ms  -> dequant (1.32x)
                     M=512 group 847.6 ms   dequant 274.5 ms -> dequant (3.1x)
        2026-08-19:  M=16  group  9.59 ms   dequant 10.5 ms  -> group (+9%)
                     M=32  group 13.16 ms   dequant 13.04 ms -> tie
                     M=64  group 25.96 ms   dequant 19.61 ms -> dequant (1.32x)

    The batched-group formulation's [G, M, N] partial sums grow with M
    while dequant's one [K, N] bf16 materialization amortizes, so
    dequant takes over decisively from M=64 up (3.1x at prefill M=512).
    M=16 flips between campaigns (noise-level); M=32 is a tie on the
    fresh run and 1.36x dequant on the 08-18 run — default 32 keeps
    decode (M<=8) and small spec-verify on the group path and loses
    nothing at the boundary on either dataset.  (The old "M=128 wedges
    the compiler" caveat is STALE: M=128/256/512 compile fine on this
    runtime.)  Override via LMDEPLOY_TPU_DEQUANT_MIN_M."""
    import os
    return int(os.environ.get('LMDEPLOY_TPU_DEQUANT_MIN_M', '32'))


def linear(x: jnp.ndarray, w, bias: Optional[jnp.ndarray] = None,
           fuse_silu_gate: bool = False) -> jnp.ndarray:
    """Dense dispatch. ``w`` is a bf16 [K, N] array or a QuantizedWeight.

    With ``fuse_silu_gate``, w holds fused [K, 2I] gate|up weights and the
    output is silu(x@w_gate) * (x@w_up) — the reference's kFusedSiluFfn
    epilogue (LlamaLinear.h:73).
    """
    lead = x.shape[:-1]
    if isinstance(w, QuantizedWeight):
        x2 = x.reshape(-1, x.shape[-1])
        if _w4a8_enabled():
            mm = quant_matmul_a8
        elif x2.shape[0] >= _dequant_min_m():
            mm = quant_matmul_dequant
        else:
            mm = quant_matmul
        out = mm(x2, w)
        out = out.reshape(*lead, -1)
    else:
        out = jnp.dot(x.astype(w.dtype), w,
                      preferred_element_type=jnp.float32)
    if fuse_silu_gate:
        gate, up = jnp.split(out, 2, axis=-1)
        out = jax.nn.silu(gate) * up
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


__all__ = ['QuantizedWeight', 'PackedInt4Weight', 'pack_int4',
           'unpack_int4', 'pack_quantized', 'quantize_weight_int4',
           'dequantize', 'quant_matmul', 'quant_matmul_packed', 'linear',
           'set_tune_table', 'tune_key']

"""Rotary position embedding with dynamic-NTK base scaling and logn
attention scaling.

Math parity with the reference kernels (formulas at
src/turbomind/kernels/decoder_masked_multihead_attention_utils.h:854-890):

- dynamic NTK:  alpha = max(2^ceil(log2(L/Lmax)+1) - 1, 1) when L >= Lmax,
  base' = base * alpha^(dim/(dim-2))   (recomputed per sequence from the
  current context length — this is what lets Qwen extrapolate)
- logn scaling: q *= log2(L)/log2(Lmax) when L > Lmax

Convention: this framework uses the HF "rotate_half" pairing (x[..., :d/2]
with x[..., d/2:]); the reference uses Meta-style interleaved pairs and
permutes HF weights at conversion (deploy.py:371).  Both produce identical
attention — we simply skip the weight permutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ntk_rope_base(context_len, max_position_embeddings: int,
                  rotary_dim: int, base: float):
    """Per-sequence dynamic-NTK rope base. ``context_len`` may be traced."""
    ctx = jnp.asarray(context_len, jnp.float32)
    ratio = jnp.maximum(ctx / max_position_embeddings, 1e-9)
    alpha = jnp.maximum(jnp.exp2(jnp.ceil(jnp.log2(ratio) + 1.0)) - 1.0, 1.0)
    scaled = base * jnp.power(alpha, rotary_dim / (rotary_dim - 2.0))
    return jnp.where(ctx < max_position_embeddings, base, scaled)


def logn_scaling(context_len, max_position_embeddings: int):
    """log_2(L)/log_2(Lmax) for L > Lmax else 1."""
    ctx = jnp.asarray(context_len, jnp.float32)
    scale = jnp.log2(jnp.maximum(ctx, 2.0)) / jnp.log2(
        jnp.float32(max_position_embeddings))
    return jnp.where(ctx <= max_position_embeddings, 1.0, scale)


def rope_cos_sin(positions: jnp.ndarray, rotary_dim: int, base,
                 inv_freq=None):
    """cos/sin tables for given positions.

    Args:
      positions: int32 [...], absolute token positions.
      rotary_dim: rope dimension (even).
      base: scalar or array broadcastable to ``positions`` (per-sequence
        dynamic-NTK bases).  Ignored when ``inv_freq`` is given.
      inv_freq: optional precomputed [rotary_dim//2] frequencies (YaRN
        per-dim interpolation does not factor through a single base).
    Returns:
      (cos, sin) of shape positions.shape + (rotary_dim//2,), float32.
    """
    if inv_freq is None:
        half = rotary_dim // 2
        exponent = jnp.arange(half, dtype=jnp.float32) * (2.0 / rotary_dim)
        base = jnp.asarray(base, jnp.float32)
        inv_freq = jnp.power(base[..., None], -exponent)  # [..., half]
    angle = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angle), jnp.sin(angle)


def hf_dynamic_ntk_base(context_len, original_max: int, rotary_dim: int,
                        base: float, factor: float):
    """HF-style dynamic-NTK base (``rope_scaling: {type: dynamic}``):
    base' = base * (factor*L/Lmax - (factor-1)) ** (d/(d-2)) for L > Lmax.
    Differs from the qwen power-of-two :func:`ntk_rope_base` — this one
    grows smoothly with the context length (transformers
    modeling_rope_utils._compute_dynamic_ntk_parameters)."""
    ctx = jnp.asarray(context_len, jnp.float32)
    grow = factor * ctx / original_max - (factor - 1.0)
    scaled = base * jnp.power(jnp.maximum(grow, 1.0),
                              rotary_dim / (rotary_dim - 2.0))
    return jnp.where(ctx <= original_max, base, scaled)


def yarn_inv_freq(rotary_dim: int, base: float, factor: float,
                  original_max: int, beta_fast: float = 32.0,
                  beta_slow: float = 1.0):
    """YaRN / NTK-by-parts frequencies + attention scale (mscale).

    Per-dimension blend between plain extrapolation (high-frequency dims,
    wavelength << context: keep local resolution) and linear interpolation
    (low-frequency dims: compress to stay in the trained range), with a
    linear ramp between the ``beta_fast``/``beta_slow`` rotation-count
    boundaries.  Math parity with transformers
    modeling_rope_utils._compute_yarn_parameters.

    Returns:
      (inv_freq [rotary_dim//2] float32, attention_factor float) — cos/sin
      tables are multiplied by attention_factor (= 0.1*ln(factor)+1).
    """
    import math

    half = rotary_dim // 2
    exponent = jnp.arange(half, dtype=jnp.float32) * (2.0 / rotary_dim)
    inv_freq_extrap = jnp.power(jnp.float32(base), -exponent)
    inv_freq_interp = inv_freq_extrap / factor

    def correction_dim(num_rotations: float) -> float:
        # dim index whose wavelength does num_rotations full turns over
        # the original context
        return (rotary_dim * math.log(
            original_max / (num_rotations * 2 * math.pi))
            / (2 * math.log(base)))

    low = math.floor(correction_dim(beta_fast))
    high = math.ceil(correction_dim(beta_slow))
    low = max(low, 0)
    # clamp to rotary_dim-1 like HF (NOT half-1: the ramp is evaluated on
    # the half-size index grid but the correction boundary lives on the
    # full dim scale — large original_max configs put high past half)
    high = min(high, rotary_dim - 1)
    ramp = (jnp.arange(half, dtype=jnp.float32) - low) \
        / max(high - low, 0.001)
    ramp = jnp.clip(ramp, 0.0, 1.0)
    extrap_w = 1.0 - ramp  # dims < low: pure extrapolation
    inv_freq = (inv_freq_interp * (1.0 - extrap_w)
                + inv_freq_extrap * extrap_w)
    attention_factor = 0.1 * math.log(factor) + 1.0
    return inv_freq, float(attention_factor)


def llama3_inv_freq(rotary_dim: int, base: float, factor: float,
                    original_max: int, low_freq_factor: float = 1.0,
                    high_freq_factor: float = 4.0):
    """Llama-3.1 frequency rescale (math parity with transformers
    modeling_rope_utils._compute_llama3_parameters): high-frequency dims
    (wavelength < orig/high_freq_factor) keep their trained frequencies,
    low-frequency dims (wavelength > orig/low_freq_factor) are divided by
    ``factor``, and the band between blends linearly in wavelength. The
    result is position-independent (static), so pages stay prefix-cacheable.
    """
    import math

    half = rotary_dim // 2
    exponent = jnp.arange(half, dtype=jnp.float32) * (2.0 / rotary_dim)
    inv_freq = jnp.power(jnp.float32(base), -exponent)
    wavelen = (2.0 * math.pi) / inv_freq
    low_wl = original_max / low_freq_factor
    high_wl = original_max / high_freq_factor
    out = jnp.where(wavelen > low_wl, inv_freq / factor, inv_freq)
    smooth = (original_max / wavelen - low_freq_factor) \
        / (high_freq_factor - low_freq_factor)
    smoothed = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
    medium = (wavelen >= high_wl) & (wavelen <= low_wl)
    return jnp.where(medium, smoothed, out)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding with the rotate-half convention.

    Args:
      x: [..., heads, head_dim]
      cos/sin: [..., rotary_dim//2] (broadcast over the heads axis)
    """
    half = cos.shape[-1]
    cos = cos[..., None, :]  # add heads axis
    sin = sin[..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:2 * half].astype(jnp.float32)
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rotated = jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
    if x.shape[-1] > 2 * half:
        rotated = jnp.concatenate([rotated, x[..., 2 * half:]], axis=-1)
    return rotated


def rope_tables(positions, context_len, *, rotary_dim: int, base: float,
                max_position_embeddings: int, use_dynamic_ntk: bool = False,
                use_logn_attn: bool = False, rope_scaling_type: str = '',
                rope_scaling_factor: float = 1.0,
                rope_original_max: int = 0,
                rope_low_freq_factor: float = 1.0,
                rope_high_freq_factor: float = 4.0):
    """Precompute (cos, sin, logn_scale_or_None) for one step — these are
    position-only and LAYER-INVARIANT, so the caller hoists them out of
    the per-layer scan (the reference likewise builds cos/sin once per
    step and reuses them in every layer's kernel launch).

    Args:
      positions: int32 [B, T] absolute positions of these tokens.
      context_len: int32 [B] total sequence length (history + new tokens)
        — the quantity the reference feeds to both NTK and logn.
      rope_scaling_type: '' | 'linear' | 'dynamic' | 'yarn' | 'llama3' — HF
        ``rope_scaling`` presets (beyond-reference: the reference only
        ships the qwen power-of-two NTK, `use_dynamic_ntk`).
      rope_scaling_factor: context-extension factor for the above.
      rope_original_max: pre-extension trained context (yarn/dynamic);
        0 means ``max_position_embeddings``.
    """
    orig_max = rope_original_max or max_position_embeddings
    factor = rope_scaling_factor
    inv_freq = None
    table_scale = None  # multiplies cos/sin (yarn attention_factor)
    if rope_scaling_type == 'linear':
        # position interpolation (Chen et al.): angle = (p/f) * inv_freq
        positions = positions / jnp.float32(factor)
        eff_base = jnp.full(positions.shape[:1] + (1,), base, jnp.float32)
    elif rope_scaling_type == 'dynamic':
        eff_base = hf_dynamic_ntk_base(context_len, orig_max, rotary_dim,
                                       base, factor)[:, None]  # [B,1]
    elif rope_scaling_type == 'yarn':
        inv_freq, table_scale = yarn_inv_freq(rotary_dim, base, factor,
                                              orig_max)
        eff_base = None
    elif rope_scaling_type == 'llama3':
        inv_freq = llama3_inv_freq(rotary_dim, base, factor, orig_max,
                                   rope_low_freq_factor,
                                   rope_high_freq_factor)
        eff_base = None
    elif use_dynamic_ntk:
        eff_base = ntk_rope_base(context_len, max_position_embeddings,
                                 rotary_dim, base)[:, None]  # [B,1]
    else:
        eff_base = jnp.full(positions.shape[:1] + (1,), base, jnp.float32)
    cos, sin = rope_cos_sin(positions, rotary_dim, eff_base,
                            inv_freq=inv_freq)  # [B,T,half]
    if table_scale is not None:
        cos = cos * table_scale
        sin = sin * table_scale
    scale = None
    if use_logn_attn:
        # The reference scales q by logn(timestep+1) per *token position*
        # during prefill (unfused_attention_kernels.cu:943-950) and by the
        # context length during decode; positions+1 covers both.
        scale = logn_scaling(positions.astype(jnp.float32) + 1.0,
                             max_position_embeddings)
    return cos, sin, scale


def apply_rope_qk(q, k, tables):
    """Rotate q [B,T,Hq,D] and k [B,T,Hk,D] with precomputed
    :func:`rope_tables` (+ the optional logn q-scale)."""
    cos, sin, scale = tables
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if scale is not None:
        q = (q.astype(jnp.float32) * scale[..., None, None]).astype(q.dtype)
    return q, k


def rope_qk(q, k, positions, context_len, *, rotary_dim: int, base: float,
            max_position_embeddings: int, use_dynamic_ntk: bool = False,
            use_logn_attn: bool = False):
    """One-shot rotate (tests / non-scan callers): tables + apply."""
    tables = rope_tables(positions, context_len, rotary_dim=rotary_dim,
                         base=base,
                         max_position_embeddings=max_position_embeddings,
                         use_dynamic_ntk=use_dynamic_ntk,
                         use_logn_attn=use_logn_attn)
    return apply_rope_qk(q, k, tables)


__all__ = ['ntk_rope_base', 'hf_dynamic_ntk_base', 'yarn_inv_freq',
           'logn_scaling', 'rope_cos_sin', 'apply_rope', 'rope_tables',
           'apply_rope_qk', 'rope_qk']

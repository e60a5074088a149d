"""Unit tests for core ops (norms, rope, int4 quant, linear)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.ops.linear import (QuantizedWeight, dequantize, linear,
                                     pack_int4, quantize_weight_int4,
                                     unpack_int4)
from lmdeploy_tpu.ops.norms import add_residual_rms_norm, rms_norm
from lmdeploy_tpu.ops.rope import (apply_rope, logn_scaling, ntk_rope_base,
                                   rope_cos_sin, rope_qk)


def test_rms_norm_matches_manual():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_add_residual_rms_norm():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32)).astype(np.float32)
    r = rng.normal(size=(2, 32)).astype(np.float32)
    w = np.ones((32,), np.float32)
    normed, new_r = add_residual_rms_norm(jnp.asarray(x), jnp.asarray(r),
                                          jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(new_r), x + r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(normed),
                               np.asarray(rms_norm(jnp.asarray(x + r),
                                                   jnp.asarray(w))),
                               rtol=1e-5)


def test_ntk_base_matches_reference_formula():
    # reference: decoder_masked_multihead_attention_utils.h:863-871
    base, max_pos, dim = 10000.0, 2048, 128
    for seq_len in [100, 2047, 2048, 4096, 10000]:
        got = float(ntk_rope_base(seq_len, max_pos, dim, base))
        if seq_len < max_pos:
            want = base
        else:
            alpha = max(2.0 ** np.ceil(np.log2(seq_len / max_pos) + 1) - 1, 1.0)
            want = base * alpha ** (dim / (dim - 2.0))
        assert got == pytest.approx(want, rel=1e-5), seq_len


def test_logn_scaling():
    assert float(logn_scaling(100, 2048)) == 1.0
    assert float(logn_scaling(2048, 2048)) == 1.0
    assert float(logn_scaling(4096, 2048)) == pytest.approx(
        np.log2(4096) / np.log2(2048))


def test_rope_rotation_preserves_norm_and_is_relative():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 2, 64)).astype(np.float32)
    pos = jnp.asarray([[0, 1, 5, 9]], jnp.int32)
    cos, sin = rope_cos_sin(pos, 64, 10000.0)
    y = apply_rope(jnp.asarray(x), cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-4)
    # Relative property: <rope(q,m), rope(k,n)> depends only on m-n.
    q = rng.normal(size=(1, 1, 1, 64)).astype(np.float32)
    k = rng.normal(size=(1, 1, 1, 64)).astype(np.float32)

    def dot_at(m, n):
        cm, sm = rope_cos_sin(jnp.asarray([[m]], jnp.int32), 64, 10000.0)
        cn, sn = rope_cos_sin(jnp.asarray([[n]], jnp.int32), 64, 10000.0)
        qm = np.asarray(apply_rope(jnp.asarray(q), cm, sm)).ravel()
        kn = np.asarray(apply_rope(jnp.asarray(k), cn, sn)).ravel()
        return float(qm @ kn)

    assert dot_at(7, 3) == pytest.approx(dot_at(14, 10), abs=1e-3)


def test_rope_qk_logn_scales_only_q():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 1, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 1, 32)), jnp.float32)
    pos = jnp.asarray([[4095]], jnp.int32)
    ctx = jnp.asarray([4096], jnp.int32)
    q1, k1 = rope_qk(q, k, pos, ctx, rotary_dim=32, base=10000.0,
                     max_position_embeddings=2048, use_logn_attn=False)
    q2, k2 = rope_qk(q, k, pos, ctx, rotary_dim=32, base=10000.0,
                     max_position_embeddings=2048, use_logn_attn=True)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2))
    scale = np.log2(4096) / np.log2(2048)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1) * scale,
                               rtol=1e-4)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 16, size=(256, 64)).astype(np.uint8)
    packed = pack_int4(q)
    assert packed.shape == (256, 32)
    got = np.asarray(unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(got, q)


def test_kv_int4_pack_roundtrip_and_write_gather():
    """Signed q-domain int4 KV nibbles round-trip exactly, and a
    write_kv -> gather_kv_layer pass through a uint8 pool reproduces the
    input within half a quantization step."""
    from lmdeploy_tpu.kvcache.paged import (init_cache, gather_kv_layer,
                                            pack_kv_int4, unpack_kv_int4,
                                            write_kv)
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.integers(-8, 8, size=(5, 3, 2, 16)), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_kv_int4(
        pack_kv_int4(q))), np.asarray(q))

    scales = [np.full(2, 0.05), np.zeros(2), np.full(2, 0.05), np.zeros(2)]
    cache = init_cache(2, 4, 8, 2, 16, jnp.uint8, kv_scales=scales)
    assert cache.quant_bits == 4 and cache.k.shape[-1] == 8
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)) * 0.2, jnp.float32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    pt = jnp.asarray([[1, 2, -1, -1]], jnp.int32)
    qp = (cache.k_scale[0], cache.k_zp[0], cache.v_scale[0], cache.v_zp[0])
    ck, cv = write_kv(cache.k, cache.v, 0, k, v, pos, pt,
                      jnp.ones((1, 8), bool), qp)
    kk, vv = gather_kv_layer(ck[0], cv[0], pt, qp, jnp.float32)
    want_k = np.clip(np.asarray(k)[0], -8 * 0.05, 7 * 0.05)
    np.testing.assert_allclose(np.asarray(kk)[0, :8], want_k, atol=0.026)


def test_quantize_dequantize_error():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    qw = quantize_weight_int4(w, group_size=128)
    wd = np.asarray(dequantize(qw, jnp.float32))
    # int4 with per-128 group scales: max error ~ scale/2 (+ bf16 rounding
    # of the stored scales).
    err = np.abs(wd - w)
    scale = np.asarray(qw.scales, np.float32)
    assert (err <= np.repeat(scale, 128, axis=0) * 0.51 + np.abs(w) * 0.01
            + 1e-6).all()


def test_quantized_linear_matches_dequant_matmul():
    rng = np.random.default_rng(6)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    x = rng.normal(size=(4, 256)).astype(np.float32)
    qw = quantize_weight_int4(w, 128)
    got = np.asarray(linear(jnp.asarray(x), qw))
    want = x @ np.asarray(dequantize(qw, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_quant_matmul_a8_close_to_a16():
    """W4A8 (per-token int8 activation quant + int8 MXU dot) must stay
    close to the W4A16 path — the added error is only the activation
    rounding.  (Path is opt-in: compile hangs on the current TPU
    runtime, see ops/linear.py _w4a8_enabled.)"""
    from lmdeploy_tpu.ops.linear import quant_matmul, quant_matmul_a8
    rng = np.random.default_rng(8)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    x = rng.normal(size=(4, 256)).astype(np.float32)
    qw = quantize_weight_int4(w, 64)
    a16 = np.asarray(quant_matmul(jnp.asarray(x), qw))
    a8 = np.asarray(quant_matmul_a8(jnp.asarray(x), qw))
    ref = x @ np.asarray(dequantize(qw, jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(a8 - ref).max() / scale < 0.03
    assert np.abs(a8 - a16).max() / scale < 0.03


def test_linear_fused_silu_gate():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    out = linear(x, w, fuse_silu_gate=True)
    full = np.asarray(x) @ np.asarray(w)
    gate, up = full[:, :32], full[:, 32:]
    want = gate / (1 + np.exp(-gate)) * up
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- rope scaling

def _hf_rope_params(rope_scaling, dim=64, base=10000.0, max_pos=2048,
                    seq_len=None):
    """transformers' own rope-scaling math as the parity oracle."""
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    cfg = LlamaConfig(hidden_size=dim * 4, num_attention_heads=4,
                      rope_theta=base, max_position_embeddings=max_pos,
                      rope_scaling=dict(rope_scaling))
    fn = ROPE_INIT_FUNCTIONS[rope_scaling['rope_type']]
    inv_freq, attn_factor = fn(cfg, device=None, seq_len=seq_len)
    return np.asarray(inv_freq), float(attn_factor)


def test_yarn_matches_transformers():
    from lmdeploy_tpu.ops.rope import yarn_inv_freq
    # (131072, dim=128) puts the correction `high` boundary (~70) past
    # half-1: the clamp must be dim-1 like HF, not half-1
    for factor, orig, dim in [(4.0, 2048, 64), (8.0, 4096, 64),
                              (2.0, 1024, 64), (8.0, 131072, 128)]:
        want_if, want_af = _hf_rope_params(
            {'rope_type': 'yarn', 'factor': factor,
             'original_max_position_embeddings': orig},
            dim=dim, base=10000.0, max_pos=orig)
        got_if, got_af = yarn_inv_freq(dim, 10000.0, factor, orig)
        np.testing.assert_allclose(np.asarray(got_if), want_if,
                                   rtol=1e-5, atol=1e-7)
        assert abs(got_af - want_af) < 1e-6


def test_hf_dynamic_ntk_matches_transformers():
    from lmdeploy_tpu.ops.rope import hf_dynamic_ntk_base
    dim, base, orig, factor = 64, 10000.0, 2048, 4.0
    for seq_len in [1024, 2048, 4096, 8192]:
        want_if, _ = _hf_rope_params(
            {'rope_type': 'dynamic', 'factor': factor},
            dim=dim, base=base, max_pos=orig, seq_len=seq_len)
        got_base = float(hf_dynamic_ntk_base(seq_len, orig, dim, base,
                                             factor))
        exponent = np.arange(0, dim, 2, dtype=np.float32) / dim
        got_if = got_base ** -exponent
        np.testing.assert_allclose(got_if, want_if, rtol=1e-5)


def test_linear_scaling_tables():
    """linear (position-interpolation) tables at factor f equal unscaled
    tables at positions p/f, and match transformers' inv_freq/f."""
    from lmdeploy_tpu.ops.rope import rope_tables
    pos = jnp.asarray([[0, 7, 31, 100]], jnp.int32)
    ctx = jnp.asarray([101], jnp.int32)
    kw = dict(rotary_dim=32, base=10000.0, max_position_embeddings=128)
    cos_s, sin_s, _ = rope_tables(pos, ctx, rope_scaling_type='linear',
                                  rope_scaling_factor=4.0, **kw)
    cos_u, sin_u, _ = rope_tables(pos / 4.0, ctx, **kw)
    np.testing.assert_allclose(np.asarray(cos_s), np.asarray(cos_u),
                               rtol=1e-5, atol=1e-6)
    want_if, want_af = _hf_rope_params(
        {'rope_type': 'linear', 'factor': 4.0}, dim=32, max_pos=128)
    angle = np.asarray(pos, np.float32)[..., None] * want_if
    np.testing.assert_allclose(np.asarray(cos_s), np.cos(angle) * want_af,
                               rtol=1e-5, atol=1e-6)


def test_yarn_tables_apply_attention_factor():
    from lmdeploy_tpu.ops.rope import rope_tables, yarn_inv_freq
    pos = jnp.asarray([[0, 5, 9000]], jnp.int32)
    ctx = jnp.asarray([9001], jnp.int32)
    cos, sin, _ = rope_tables(pos, ctx, rotary_dim=64, base=10000.0,
                              max_position_embeddings=2048,
                              rope_scaling_type='yarn',
                              rope_scaling_factor=8.0)
    inv_freq, af = yarn_inv_freq(64, 10000.0, 8.0, 2048)
    angle = np.asarray(pos, np.float32)[..., None] * np.asarray(inv_freq)
    np.testing.assert_allclose(np.asarray(cos), np.cos(angle) * af,
                               rtol=1e-5, atol=1e-6)
    assert float(np.abs(np.asarray(cos)).max()) <= af + 1e-6


def test_llama3_rope_matches_transformers():
    """llama3 rope_scaling (Llama-3.1) frequency rescale must match
    transformers' _compute_llama3_parameters."""
    from lmdeploy_tpu.ops.rope import llama3_inv_freq
    want_if, want_af = _hf_rope_params(
        {'rope_type': 'llama3', 'factor': 8.0, 'low_freq_factor': 1.0,
         'high_freq_factor': 4.0,
         'original_max_position_embeddings': 8192},
        dim=128, base=500000.0, max_pos=131072)
    got = llama3_inv_freq(128, 500000.0, 8.0, 8192, 1.0, 4.0)
    np.testing.assert_allclose(np.asarray(got), want_if,
                               rtol=1e-5, atol=1e-8)
    assert want_af == 1.0  # no cos/sin post-scale for llama3

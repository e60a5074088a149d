"""Quantization toolkit tests: AWQ smoothing exactness, calibration
observers, end-to-end auto_awq -> workspace -> engine, KV qparams export
(reference test analogue: tests/test_lmdeploy/test_lite/)."""
import json
import os
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def tiny_hf_llama(tmp_path_factory):
    """A random tiny HF llama saved to disk (no checkpoints in env)."""
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, vocab_size=256,
                      max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp('hf_tiny')
    model.save_pretrained(d)
    return str(d), model


def test_smoothing_is_exact_reparam(tiny_hf_llama):
    """Smoothed model must produce identical logits (float64 tolerance)."""
    from transformers import LlamaForCausalLM

    from lmdeploy_tpu.lite.quantization.awq import smooth_state_dict

    path, model = tiny_hf_llama
    ids = torch.arange(10)[None] % 256
    with torch.no_grad():
        want = model(ids).logits

    sd = {k: v.detach().float().numpy().copy()
          for k, v in model.state_dict().items()}
    act = {}
    for i in range(2):
        p = f'model.layers.{i}'
        act[f'{p}.self_attn.q_proj'] = np.abs(
            np.random.default_rng(i).normal(size=(64,))).astype(np.float32) + 0.1
        act[f'{p}.mlp.gate_proj'] = np.abs(
            np.random.default_rng(i + 9).normal(size=(64,))).astype(np.float32) + 0.1
        act[f'{p}.self_attn.o_proj'] = np.abs(
            np.random.default_rng(i + 5).normal(size=(64,))).astype(np.float32) + 0.1
        act[f'{p}.mlp.down_proj'] = np.abs(
            np.random.default_rng(i + 7).normal(size=(128,))).astype(np.float32) + 0.1
    smooth_state_dict(sd, 'llama', act, 2, group_size=16)

    model2 = LlamaForCausalLM(model.config).eval()
    model2.load_state_dict({k: torch.from_numpy(np.asarray(v))
                            for k, v in sd.items()})
    with torch.no_grad():
        got = model2(ids).logits
    assert torch.allclose(want, got, rtol=1e-3, atol=1e-4)


def test_calibrate_and_auto_awq_end_to_end(tiny_hf_llama, tmp_path):
    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.lite.apis.auto_awq import auto_awq
    from lmdeploy_tpu.lite.apis.calibrate import calibrate
    from lmdeploy_tpu.lite.apis.kv_qparams import kv_qparams
    from lmdeploy_tpu.messages import GenerationConfig

    path, _ = tiny_hf_llama
    work = str(tmp_path / 'work')
    dst = str(tmp_path / 'ws')
    stats = calibrate(path, 'synthetic', calib_samples=2, calib_seqlen=32,
                      work_dir=work)
    assert osp.exists(stats)
    auto_awq(path, work_dir=work, dst=dst, w_group_size=16)
    assert osp.exists(osp.join(dst, 'weights.safetensors'))
    with open(osp.join(dst, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['model']['weight_type'] == 'int4'

    # KV-INT8 qparams onto the same workspace
    kv_qparams(work, dst)
    with open(osp.join(dst, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['engine']['quant_policy'] == 4
    assert len(cfg['kv_scales']) == 4
    assert len(cfg['kv_scales'][0]) == 2  # [L]

    # engine boots from the quantized workspace and generates
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, prefill_buckets=(16,),
                        max_context_token_num=16, use_pallas=False,
                        step_length=2, quant_policy=4)
    eng = build_engine(dst, engine_config=ecfg)
    try:
        out = eng.create_instance().infer(
            1, [3, 5, 7], gen_config=GenerationConfig(
                max_new_tokens=4, top_k=1, ignore_eos=True),
            sequence_end=True)
        assert len(out.token_ids) == 4
    finally:
        eng.shutdown()

    # KV-INT4 (beyond-reference): re-export qparams at 4 bits, boot the
    # engine on the nibble-packed pool and generate through decode rounds
    kv_qparams(work, dst, kv_bits=4)
    with open(osp.join(dst, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['engine']['quant_policy'] == 8
    assert cfg['engine']['kv_dtype'] == 'int4'
    import dataclasses as dc
    eng = build_engine(dst, engine_config=dc.replace(ecfg, quant_policy=8))
    try:
        import jax.numpy as jnp
        assert eng.cache.k.dtype == jnp.uint8
        out = eng.create_instance().infer(
            1, [3, 5, 7], gen_config=GenerationConfig(
                max_new_tokens=4, top_k=1, ignore_eos=True),
            sequence_end=True)
        assert len(out.token_ids) == 4
    finally:
        eng.shutdown()


def test_kv_qparams_roundtrip_accuracy(tiny_hf_llama, tmp_path):
    """Asym KV-INT8 qparams must reconstruct values, not clip them.

    Regression test for the zero-point sign: with zp stored in the
    quantized domain and q = f/scale + zp, data in a one-sided range
    like [0.2, 1.0] must still use the full int8 range.  (Reference
    publishes asym accuracy tables in docs/en/kv_int8.md.)"""
    from lmdeploy_tpu.kvcache.paged import dequantize_kv, quantize_kv
    from lmdeploy_tpu.lite.apis.calibrate import calibrate
    from lmdeploy_tpu.lite.apis.kv_qparams import kv_qparams

    path, _ = tiny_hf_llama
    work = str(tmp_path / 'work')
    dst = str(tmp_path / 'ws')
    calibrate(path, 'synthetic', calib_samples=2, calib_seqlen=32,
              work_dir=work)
    os.makedirs(dst, exist_ok=True)
    with open(osp.join(dst, 'config.json'), 'w') as f:
        json.dump({}, f)
    kv_qparams(work, dst)
    with open(osp.join(dst, 'config.json')) as f:
        ks, kz, vs, vz = json.load(f)['kv_scales']

    # Synthetic one-sided KV data inside each layer's calibrated range
    # must round-trip through int8 with small error (not collapse to
    # the clip rail, which the inverted-sign zp caused).
    rng = np.random.default_rng(0)
    for scale, zp in [(ks[0], kz[0]), (vs[0], vz[0])]:
        lo = -zp * scale - 100 * scale      # stay inside the range
        x = (lo + scale * rng.uniform(0, 200, size=(256,))).astype(
            np.float32)
        q = np.asarray(quantize_kv(x, scale, zp))
        deq = np.asarray(dequantize_kv(q, scale, zp, dtype=np.float32))
        assert not np.all(q == 127), 'all values hit the int8 clip rail'
        assert np.max(np.abs(deq - x)) <= 0.51 * scale + 1e-6


def test_ppl_harness_end_to_end(tiny_hf_llama):
    """benchmark/ppl.py runs bf16 / W4A16 / KV-INT8 through the engine's
    prompt-logits path on real text chunks and reports sane deltas (the
    reference's accuracy-table pipeline, docs/en/kv_int8.md + w4a16.md),
    cross-checked against the torch eager oracle."""
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
    from benchmark.ppl import run

    path, _ = tiny_hf_llama
    engine_kw = dict(max_batch_size=2, page_size=8, num_pages=64,
                     prefill_buckets=(128,), use_pallas=False,
                     step_length=2)
    res = run(path, dataset='synthetic', nsamples=2, seqlen=96,
              configs=['bf16', 'w4a16', 'kv_int8', 'kv_int4'],
              group_size=16, oracle=True, engine_kw=engine_kw)
    base = res['bf16']
    assert 1.0 < base < 1e5
    # bf16 engine path must agree with the torch-eager oracle closely
    assert abs(res['torch_oracle'] - base) / base < 0.05
    # quantization degrades ppl only mildly on this tiny model
    assert abs(res['w4a16'] - base) / base < 0.5
    assert abs(res['kv_int8'] - base) / base < 0.5
    # int4 KV (beyond-reference): coarser, still sane on calib'd scales
    assert abs(res['kv_int4'] - base) / base < 1.0


def test_quant_error_reduced_by_smoothing(tiny_hf_llama):
    """AWQ's point: per-channel outlier folding reduces int4 error on the
    salient channels. Check weight-domain reconstruction error doesn't
    increase after smoothing for an outlier-heavy synthetic activation."""
    from lmdeploy_tpu.lite.quantization.awq import smooth_ln_fcs
    from lmdeploy_tpu.ops.linear import dequantize, quantize_weight_int4

    rng = np.random.default_rng(0)
    d = 64
    w = rng.normal(size=(d, d)).astype(np.float32)
    act = np.ones((d,), np.float32)
    act[::8] = 50.0  # outlier channels
    sd = {'ln.weight': np.ones((d,), np.float32), 'fc.weight': w.copy()}
    s = smooth_ln_fcs(sd, 'ln', ['fc'], act, group_size=16)
    assert np.all(s > 0)

    def recon_err(weight, x_scale):
        qw = quantize_weight_int4(weight.T, group_size=16)
        deq = np.asarray(dequantize(qw, np.float32)).T
        return np.abs((deq - weight) * x_scale[None, :]).mean()

    base = recon_err(w, act)
    smoothed = recon_err(sd['fc.weight'], act / s)
    assert smoothed <= base * 1.05


def test_w4a16_logits_close_to_fp(tiny_hf_llama, tmp_path):
    """End-to-end W4A16 numerics: quantized-engine prompt logits stay
    close to the fp HF oracle (the reference validates AWQ by ppl delta,
    docs/en/w4a16.md)."""
    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.convert.converter import convert_hf

    path, model = tiny_hf_llama
    ws = str(tmp_path / 'ws_q')
    convert_hf(path, ws, quantize=True, group_size=16)
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, prefill_buckets=(16,),
                        max_context_token_num=16, use_pallas=False,
                        step_length=2)
    eng = build_engine(ws, engine_config=ecfg)
    try:
        prompt = [1, 5, 9, 13, 21, 30, 7, 3]
        got = eng.create_instance().decode(prompt)
        import torch
        with torch.no_grad():
            want = model(torch.as_tensor(prompt)[None]).logits[0].numpy()
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.98, corr
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree >= 0.75, agree
    finally:
        eng.shutdown()


def test_calib_dataloader_file_and_dir(tmp_path):
    """file:<path> calibration source contract: a plain-text file (or a
    directory of .txt files, concatenated sorted-by-name) is tokenized
    whole and sampled into nsamples [1, seqlen] LongTensor chunks,
    repeating the text when it is shorter than nsamples*seqlen
    (reference analogue: calib_dataloader.py get_calib_loaders)."""
    from benchmark.accuracy import train_tokenizer
    from transformers import AutoTokenizer

    from lmdeploy_tpu.lite.utils.calib_dataloader import get_calib_loaders

    tok_dir = tmp_path / 'tok'
    tok_dir.mkdir()
    train_tokenizer('the model streams tokens through the cache '
                    'attention layers quantize weights pages hold keys '
                    'and values tiny corpus', str(tok_dir))
    tok = AutoTokenizer.from_pretrained(str(tok_dir))

    one = tmp_path / 'corpus.txt'
    one.write_text('the model streams tokens through the cache. ' * 40)
    samples = get_calib_loaders(f'file:{one}', tok, nsamples=3, seqlen=16)
    assert len(samples) == 3
    for s in samples:
        assert tuple(s.shape) == (1, 16) and s.dtype == torch.long

    d = tmp_path / 'corpus_dir'
    d.mkdir()
    (d / 'b.txt').write_text('attention layers quantize weights. ' * 30)
    (d / 'a.txt').write_text('pages hold keys and values. ' * 30)
    samples = get_calib_loaders(f'file:{d}', tok, nsamples=2, seqlen=8)
    assert len(samples) == 2 and tuple(samples[0].shape) == (1, 8)

    # short text repeats rather than underfilling
    short = tmp_path / 'short.txt'
    short.write_text('tiny corpus')
    samples = get_calib_loaders(f'file:{short}', tok, nsamples=2, seqlen=32)
    assert len(samples) == 2 and tuple(samples[0].shape) == (1, 32)

    with pytest.raises(ValueError, match='unknown calib dataset'):
        get_calib_loaders('nope', tok, nsamples=1, seqlen=8)

"""Cross-backend numerics: the TPU engine's prompt logits / ppl must
match the HF eager baseline on the same checkpoint (reference:
tests/pytorch/test_decode.py compares Engine.decode vs plain HF)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def tiny_hf(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=256,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp('hf')
    model.save_pretrained(d)
    return str(d)


def test_engine_logits_match_hf_baseline(tiny_hf, tmp_path):
    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.convert.converter import convert_hf
    from lmdeploy_tpu.pytorch.decode import Engine, perplexity

    ws = str(tmp_path / 'ws')
    convert_hf(tiny_hf, ws)
    prompts = [[1, 5, 9, 13, 21, 30], [2, 4, 6]]

    hf = Engine(tiny_hf)
    hf_logits = hf.decode(prompts)
    ppl_hf = perplexity(hf_logits, prompts)

    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, prefill_buckets=(8, 16),
                        max_context_token_num=16, use_pallas=False)
    eng = build_engine(ws, engine_config=ecfg)
    try:
        inst = eng.create_instance()
        for i, p in enumerate(prompts):
            got = inst.decode(p)                      # [len, vocab]
            want = hf_logits[i, :len(p)]
            # bf16 workspace vs f32 torch: compare top-1 agreement + close
            np.testing.assert_array_equal(got.argmax(-1),
                                          want.argmax(-1))
            corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
            assert corr > 0.999, corr
        tpu_logits = np.zeros_like(hf_logits)
        for i, p in enumerate(prompts):
            tpu_logits[i, :len(p)] = inst.decode(p)
        ppl_tpu = perplexity(tpu_logits, prompts)
        assert abs(ppl_tpu - ppl_hf) / ppl_hf < 0.02
    finally:
        eng.shutdown()


def test_session_manager_history():
    from lmdeploy_tpu.pytorch.session import BasicSessionManagerWithHistory
    sm = BasicSessionManagerWithHistory(max_session_len=10, reduce_size=4)
    ids = sm.prepend_history([1, 2, 3])
    assert ids == [1, 2, 3]
    sm.add_to_history([4, 5])
    ids = sm.prepend_history([6, 7, 8, 9, 10, 11])
    assert len(ids) <= 10 and ids[-1] == 11

"""Chat-template behavior parity tests (modeled on the reference's
tests/test_lmdeploy/test_model.py)."""
import pytest

from lmdeploy_tpu.model import MODELS, SamplingParam


def test_base_completion_passthrough():
    model = MODELS.get('llama')(capability='completion')
    assert model.get_prompt('hello') == 'hello'
    assert model.stop_words is None
    assert model.session_len == 2048


def test_vicuna():
    prompt = 'hello, can you ci'
    model = MODELS.get('vicuna')(capability='chat')
    assert model.get_prompt(prompt, sequence_start=True) == \
        f'{model.system} {model.user}: {prompt} {model.assistant}: '
    assert model.get_prompt(prompt, sequence_start=False) == \
        f'</s>{model.user}: {prompt} {model.assistant}: '
    model = MODELS.get('vicuna')(capability='completion')
    assert model.get_prompt(prompt) == prompt


def test_internlm_chat():
    prompt = 'hi'
    model = MODELS.get('internlm-chat-7b')()
    assert model.get_prompt(prompt, sequence_start=True) == \
        f'<BOS><|User|>:{prompt}\n<|Bot|>:'
    assert model.get_prompt(prompt, sequence_start=False) == \
        f'\n<|User|>:{prompt}\n<|Bot|>:'
    assert model.stop_words == [103028]
    assert MODELS.get('internlm-chat-7b-8k')().session_len == 8192


def test_messages2prompt_history():
    model = MODELS.get('internlm-chat-7b')()
    messages = [
        dict(role='user', content='q1'),
        dict(role='assistant', content='a1'),
        dict(role='user', content='q2'),
    ]
    out = model.messages2prompt(messages)
    assert out == ('<BOS><|User|>:q1\n<|Bot|>:a1<eoa>\n'
                   '<|User|>:q2\n<|Bot|>:')


def test_llama2():
    model = MODELS.get('llama2')()
    prompt = 'hi'
    expected = (f'<BOS>[INST] <<SYS>>\n {model.default_sys_prompt} '
                f'\n<</SYS>>\n\n{prompt} [/INST] ')
    assert model.get_prompt(prompt, sequence_start=True) == expected
    assert model.get_prompt(prompt, sequence_start=False) == \
        f'[INST] {prompt} [/INST] '
    assert model.session_len == 4096
    messages = [
        dict(role='system', content='sys'),
        dict(role='user', content='q1'),
        dict(role='assistant', content='a1'),
        dict(role='user', content='q2'),
    ]
    out = model.messages2prompt(messages)
    assert out == ('<BOS>[INST] <<SYS>>\n sys \n<</SYS>>\n\n'
                   'q1 [/INST] a1[INST] q2 [/INST] ')


def test_qwen():
    model = MODELS.get('qwen-7b')()
    prompt = 'hi'
    assert model.get_prompt(prompt, sequence_start=True) == (
        '<|im_start|>system\nYou are a helpful assistant.<|im_end|>'
        '\n<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n')
    assert model.stop_words == [151645]
    sp = model.sampling_param
    assert sp.top_p == 0.5 and sp.top_k == 40 and sp.temperature == 1.0


def test_baichuan():
    model = MODELS.get('baichuan-7b')()
    assert model.sampling_param.repetition_penalty == 1.1
    model2 = MODELS.get('baichuan2-7b')()
    assert model2.get_prompt('hi') == '<reserved_106>hi<reserved_107>'
    sp = model2.sampling_param
    assert (sp.temperature, sp.top_k, sp.top_p, sp.repetition_penalty) == \
        (0.3, 5, 0.85, 1.05)


def test_codellama_completion():
    model = MODELS.get('codellama')(capability='completion')
    assert model.get_prompt('def f():') == 'def f():'
    assert model.temperature == 0.2 and model.top_p == 0.9


def test_codellama_infilling():
    model = MODELS.get('codellama')(capability='infilling')
    prompt = 'def f(x):<FILL>    return y'
    assert model.get_prompt(prompt) == \
        '<BOS><PRE> def f(x): <SUF>    return y <MID>'
    assert model.stop_words == [32010]
    assert model.temperature == 0.0
    model = MODELS.get('codellama')(capability='infilling', suffix_first=True)
    assert model.get_prompt(prompt) == \
        '<BOS><PRE> <SUF>    return y <MID> def f(x):'


def test_codellama_chat():
    model = MODELS.get('codellama')(capability='chat', system='sys')
    assert model.get_prompt('hi', sequence_start=True) == \
        '<BOS>[INST] <<SYS>>\nsys\n<</SYS>>\n\nhi [/INST]'
    assert model.top_p == 0.95


def test_codellama_invalid_capability():
    with pytest.raises(AssertionError):
        MODELS.get('codellama')(capability='bad')


def test_sampling_param_defaults():
    assert SamplingParam() == SamplingParam(0.8, None, 0.8, 1.0)


def test_best_match():
    from lmdeploy_tpu.model import best_match_model
    assert best_match_model('/models/Llama-2-7b-chat-hf') == 'llama2'
    assert best_match_model('internlm-chat-7b') == 'internlm-chat'
    assert best_match_model('Qwen-7B-Chat') == 'qwen-7b'
    assert best_match_model('CodeLlama-7b-hf') == 'codellama'

"""Tokenizer-layer tests (reference: tests/python/test_tokenizer.py —
encode/decode roundtrip incl. incremental-decode offsets)."""
import numpy as np
import pytest

from lmdeploy_tpu.tokenizer import DummyTokenizer


def test_dummy_roundtrip():
    tok = DummyTokenizer(vocab_size=512)
    ids = tok.encode('hello world')
    assert all(0 <= i < 512 for i in ids)
    assert tok.decode(ids) == 'hello world'


def test_dummy_bos_marker():
    tok = DummyTokenizer(vocab_size=512)
    ids = tok.encode('<BOS>abc')
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids[1:]) == 'abc'


def test_incremental_decode_offsets():
    """Streaming detok: decode(ids, offset) must concatenate to the full
    decode (the serving layer's contract)."""
    tok = DummyTokenizer(vocab_size=512)
    ids = tok.encode('the quick brown fox')
    pieces = []
    offset = 0
    for end in range(1, len(ids) + 1):
        pieces.append(tok.decode(ids[:end], offset=offset))
        offset = end
    assert ''.join(pieces) == tok.decode(ids)


def test_hf_tokenizer_when_available(tmp_path):
    """HuggingFaceTokenizer path with a real fast tokenizer built from a
    tiny trained vocab (no network)."""
    tokenizers = pytest.importorskip('tokenizers')
    from tokenizers import Tokenizer as RawTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import WordLevelTrainer

    raw = RawTok(WordLevel(unk_token='<unk>'))
    raw.pre_tokenizer = Whitespace()
    trainer = WordLevelTrainer(
        special_tokens=['<unk>', '<s>', '</s>'])
    raw.train_from_iterator(['hello world foo bar baz qux'] * 4, trainer)
    raw.save(str(tmp_path / 'tokenizer.json'))
    import json
    with open(tmp_path / 'tokenizer_config.json', 'w') as f:
        json.dump({'bos_token': '<s>', 'eos_token': '</s>',
                   'model_max_length': 512,
                   'tokenizer_class': 'PreTrainedTokenizerFast'}, f)

    from lmdeploy_tpu.tokenizer import Tokenizer
    tok = Tokenizer(str(tmp_path))
    ids = tok.encode('hello world')
    assert len(ids) == 2
    out = tok.decode(ids)
    assert 'hello' in out and 'world' in out


def test_dummy_stop_sequences_for():
    tok = DummyTokenizer(vocab_size=512)
    seqs = tok.stop_sequences_for(['x', 'xyz'])
    assert seqs[0] == tok.encode('x') and len(seqs[0]) == 1
    assert seqs[1] == tok.encode('xyz') and len(seqs[1]) == 3


def test_hf_vocab_scan_stop_expansion(tmp_path):
    """indexes_containing_token must scan PIECE TEXT for containment
    (reference tokenizer behavior), and stop_sequences_for must route
    multi-token stop strings into id sequences instead of dropping."""
    tokenizers = pytest.importorskip('tokenizers')
    from tokenizers import Tokenizer as RawTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import WordLevelTrainer

    raw = RawTok(WordLevel(unk_token='<unk>'))
    raw.pre_tokenizer = Whitespace()
    trainer = WordLevelTrainer(special_tokens=['<unk>', '<s>', '</s>'])
    raw.train_from_iterator(['hello world helloish bar'] * 4, trainer)
    raw.save(str(tmp_path / 'tokenizer.json'))
    import json
    with open(tmp_path / 'tokenizer_config.json', 'w') as f:
        json.dump({'bos_token': '<s>', 'eos_token': '</s>',
                   'model_max_length': 512,
                   'tokenizer_class': 'PreTrainedTokenizerFast'}, f)

    from lmdeploy_tpu.tokenizer import Tokenizer
    tok = Tokenizer(str(tmp_path))
    hello = tok.encode('hello')[0]
    helloish = tok.encode('helloish')[0]
    # containment scan: both pieces contain 'hello'
    ids = tok.indexes_containing_token('hello')
    assert hello in ids and helloish in ids
    # multi-token stop string -> one multi-token stop sequence
    seqs = tok.stop_sequences_for(['hello world'])
    assert [tok.encode('hello world')] == seqs


def test_stop_string_cross_boundary_encoding_kept():
    """A stop string that some vocab piece CONTAINS can also be emitted
    across token boundaries (e.g. "\\n\\n" as two "\\n" tokens); the
    multi-token encoding must be registered alongside the containment
    hits, not suppressed by them."""
    import types

    from lmdeploy_tpu.tokenizer import Tokenizer
    tok = Tokenizer.__new__(Tokenizer)
    tok.model = types.SimpleNamespace(
        encode=lambda s, add_bos=False: [3, 3] if s == '\n\n' else [9],
        indexes_containing_token=lambda t: [7] if t == '\n\n' else [])
    seqs = tok.stop_sequences_for(['\n\n'])
    assert [7] in seqs          # containment hit (device stop word)
    assert [3, 3] in seqs       # cross-boundary encoding (host matcher)


# ---------------------------------------------------------------------------
# tiktoken backend (qwen-style vocab; ref deploy.py:786-913)
# ---------------------------------------------------------------------------

def _write_tiktoken_vocab(tmp_path):
    """256 single-byte ranks + a few merges — a minimal valid BPE."""
    import base64
    lines = []
    for i in range(256):
        lines.append(b'%s %d' % (base64.b64encode(bytes([i])), i))
    for j, merge in enumerate((b'he', b'll', b'llo', b' wo')):
        lines.append(b'%s %d' % (base64.b64encode(merge), 256 + j))
    p = tmp_path / 'qwen.tiktoken'
    p.write_bytes(b'\n'.join(lines) + b'\n')
    return tmp_path


def test_tiktoken_backend_roundtrip(tmp_path):
    pytest.importorskip('tiktoken')
    from lmdeploy_tpu.tokenizer import Tokenizer
    tok = Tokenizer(str(_write_tiktoken_vocab(tmp_path)))
    from lmdeploy_tpu.tokenizer import TiktokenTokenizer
    assert isinstance(tok.model, TiktokenTokenizer)
    s = 'hello world'
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    # merges actually apply (not byte-per-char)
    assert len(ids) < len(s)
    # incremental decode: offset slices the new suffix
    assert tok.decode(ids, offset=len(ids) - 1) == tok.model.decode(
        ids[len(ids) - 1:])
    # eos is the first special (<|endoftext|>), right after the ranks
    assert tok.eos_token_id == 260
    assert tok.model.bos_token_id is None


def test_tiktoken_specials_and_stops(tmp_path):
    pytest.importorskip('tiktoken')
    from lmdeploy_tpu.tokenizer import Tokenizer
    tok = Tokenizer(str(_write_tiktoken_vocab(tmp_path)))
    # chat-template markers encode as single special ids
    ids = tok.encode('<|im_start|>hi<|im_end|>')
    assert ids[0] == 261 and ids[-1] == 262
    # stop-word expansion through the facade: piece containment works
    stops = tok.stop_sequences_for(['<|im_end|>'])
    assert [262] in stops
    # multi-token stop strings become host-side stop sequences
    stops = tok.stop_sequences_for(['xy'])
    assert list(tok.encode('xy')) in stops

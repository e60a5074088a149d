"""Engine soak: concurrent mixed-operation stress against one engine —
generations, multi-turn continuations, cancels, logits requests and
session ends racing from many client threads (the reference relies on
pthread-barrier discipline; here the single engine thread must serialize
everything without deadlock or cross-session corruption)."""
import queue
import random
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import EngineConfig, ModelConfig
from lmdeploy_tpu.engine.engine import TPUEngine
from lmdeploy_tpu.messages import GenerationConfig, ResponseType
from lmdeploy_tpu.models.llama import init_params

CFG = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=128, session_len=128, end_id=2)


@pytest.mark.parametrize('pp', [1, 2])
def test_soak_mixed_operations(pp):
    """pp=2 runs the same soak over a pipeline mesh: admissions, cancels
    and retirements race against ring dispatches that switch between the
    'candidates' programs as greedy/sampled traffic mixes."""
    ecfg = EngineConfig(max_batch_size=3 if pp == 1 else 4, session_len=64,
                        page_size=8, num_pages=36 if pp == 1 else 48,
                        max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=4, pp=pp, tp=2 if pp == 2 else 1)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    inst = eng.create_instance()
    errors = []
    lock = threading.Lock()

    def client(cid):
        rng = random.Random(cid)
        try:
            for turn in range(4):
                op = rng.random()
                # mixed greedy/sampled traffic exercises decode-program
                # switching (ring 'candidates' vs 'full', spec gating)
                top_k = rng.choice([1, 1, 1, 20])
                gen = GenerationConfig(max_new_tokens=rng.randint(2, 6),
                                       top_k=top_k, temperature=0.8,
                                       random_seed=cid, ignore_eos=True)
                if op < 0.6:  # fresh generation
                    out = inst.infer(cid, rng.sample(range(3, 120), 4),
                                     gen_config=gen, sequence_end=True)
                    assert out.finished
                elif op < 0.8:  # multi-turn
                    inst.infer(cid, [5, cid % 100 + 3], gen_config=gen)
                    out = inst.infer(cid, [7], gen_config=gen,
                                     sequence_start=False)
                    inst.end(cid)
                    assert out.status in (ResponseType.FINISH,
                                          ResponseType.SESSION_NOT_EXIST)
                elif op < 0.9:  # cancel race
                    q = eng.submit(__import__(
                        'lmdeploy_tpu.messages', fromlist=['EngineRequest']
                    ).EngineRequest(session_id=cid, input_ids=[3, 4, 5],
                                    gen_config=GenerationConfig(
                                        max_new_tokens=20, top_k=1,
                                        ignore_eos=True),
                                    sequence_end=True))
                    inst.cancel(cid)
                    while True:
                        out = q.get(timeout=60)
                        if out.finished:
                            break
                else:  # prompt logits
                    logits = inst.decode([3, 9, 27, 4])
                    assert logits.shape == (4, CFG.vocab_size)
                    assert np.isfinite(logits).all()
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append((cid, repr(e)))

    threads = [threading.Thread(target=client, args=(100 + i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    eng.shutdown()
    assert not errors, errors
    assert not any(t.is_alive() for t in threads), 'client hung'

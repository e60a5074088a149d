"""Peer-host engine worker for the router test: builds the same tiny
deterministic engine as the parent test and serves it on a TCP port
(lmdeploy_tpu.serve.router.serve_engine).  Run: _router_worker.py <port>."""
import os
import sys

# the image's sitecustomize PINS JAX_PLATFORMS=axon (real TPU) — a
# setdefault is a no-op and the worker would grab (or hang on) the chip;
# force CPU both in the env and the in-process config like conftest.py
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('XLA_FLAGS', None)

import jax                                                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp                                       # noqa: E402

from lmdeploy_tpu.config import EngineConfig, ModelConfig     # noqa: E402
from lmdeploy_tpu.engine.engine import TPUEngine              # noqa: E402
from lmdeploy_tpu.models.llama import init_params             # noqa: E402
from lmdeploy_tpu.serve.router import serve_engine            # noqa: E402

CFG = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=128, session_len=128, end_id=2)
ECFG = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                    num_pages=32, max_context_token_num=16,
                    prefill_buckets=(8, 16), use_pallas=False,
                    step_length=4)


def main():
    port = int(sys.argv[1])
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    engine = TPUEngine(CFG, ECFG, params)
    # warm the compile caches BEFORE announcing readiness so the parent's
    # timing doesn't include this worker's first-compile
    inst = engine.create_instance()
    from lmdeploy_tpu.messages import GenerationConfig
    inst.infer(-99, [1, 2, 3], gen_config=GenerationConfig(
        max_new_tokens=2, top_k=1, ignore_eos=True), sequence_end=True)
    print('READY', flush=True)
    serve_engine(engine, host='127.0.0.1', port=port)


if __name__ == '__main__':
    main()

"""Worker for the cross-host SPMD engine test (test_multihost.py).

Both processes build the SAME TPUEngine over a tp=2 mesh that SPANS the
two processes (1 CPU device each — the pod-slice topology where a model
too big for one host tp-shards over ICI).  Process 0 runs the real
scheduler (serve_leader: every device dispatch framed to followers over
broadcast_control, so the admission path's install_slot/prefill frames
cross hosts through it); process 1 replays the frames against its
replica of the device state (serve_follower).  Tokens stream on the
leader; BOTH processes execute every collective of every dispatch.
"""
import json
import os
import sys


def main():
    pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('XLA_FLAGS', None)  # 1 device per process
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from lmdeploy_tpu.parallel.multihost import (init_multihost,
                                                 serve_follower,
                                                 serve_leader,
                                                 stop_followers)
    idx = init_multihost(f'localhost:{port}', nprocs, pid)

    import jax.numpy as jnp

    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig
    from lmdeploy_tpu.models.llama import init_params

    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=16, max_position_embeddings=128,
                      session_len=128, end_id=2)
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(16,), use_pallas=False,
                        step_length=2, tp=2, speculative_k=2)
    # identical checkpoint on every host (same seed)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(cfg, ecfg, params, start=False)

    res = {'process_index': idx, 'process_count': jax.process_count(),
           'mesh_shape': dict(eng.mesh.shape),
           'mesh_procs': sorted({d.process_index
                                 for d in eng.mesh.devices.flat})}
    if idx == 0:
        channel = serve_leader(eng)
        inst = eng.create_instance()
        # greedy request: prefill + spec_decode_rounds frames cross hosts
        out = inst.infer(1, [3, 9, 4, 9, 4], gen_config=GenerationConfig(
            max_new_tokens=8, top_k=1, ignore_eos=True),
            sequence_end=True)
        res['token_ids'] = out.token_ids
        res['finished'] = out.finished
        res['spec_rounds'] = eng.stats['spec_rounds']
        # sampled request: the rejection-verify dispatch class too
        out2 = inst.infer(2, [5, 7, 5, 7], gen_config=GenerationConfig(
            max_new_tokens=6, top_k=20, top_p=0.9, temperature=0.9,
            random_seed=11, ignore_eos=True), sequence_end=True)
        res['sampled_token_ids'] = out2.token_ids
        # quiesce the scheduler BEFORE the stop frame: the engine thread
        # keeps dispatching (retire/clear_slot) after infer() returns,
        # and every dispatch needs followers still pumping frames
        eng.shutdown()
        stop_followers(channel)
    else:
        res['frames'] = serve_follower(eng)
        eng.shutdown()

    with open(os.path.join(outdir, f'engine_worker_{pid}.json'), 'w') as f:
        json.dump(res, f)

    # teardown: align both processes, then hard-exit — the engine's
    # parked daemon thread + gloo destructors abort() during normal
    # interpreter teardown (results are already on disk; a non-zero rc
    # still propagates for any failure above)
    from lmdeploy_tpu.parallel.multihost import sync_hosts
    sync_hosts('engine-test-done')
    os._exit(0)


if __name__ == '__main__':
    main()

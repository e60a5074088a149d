"""Confirm the quant-matmul regime crossover on the live chip, including
the small-M boundary the new default (LMDEPLOY_TPU_DEQUANT_MIN_M=16)
depends on.  Prints ONE JSON line."""
import json
import sys

sys.path.insert(0, '/root/repo')


def main():
    from benchmark.autotune import measure_mm_regime
    from lmdeploy_tpu.config import ModelConfig

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=2048, weight_type='int4', group_size=128)
    rows = {}
    for m in (1, 4, 8, 16, 32, 64, 128, 512):
        r = measure_mm_regime(cfg, m, iters=20)
        rows[str(m)] = {k: round(v, 2) for k, v in r.items()}
        print(f'# M={m}: {rows[str(m)]}', flush=True)
    print(json.dumps({'mm_regime': rows}), flush=True)


if __name__ == '__main__':
    main()

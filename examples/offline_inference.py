"""Offline batch inference without the serving layer.

Counterpart of the reference's C++ example (examples/cpp/llama/
llama_triton_example.cc): drive the engine directly with a batch of
prompts, exercising admission, continuous batching and retirement."""
import argparse
import os.path as _osp
import sys as _sys
import threading

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser('offline batch inference')
    ap.add_argument('model_path')
    ap.add_argument('--prompts', nargs='*',
                    default=['Hello, my name is',
                             'The capital of France is',
                             'In a shocking turn of events,'])
    ap.add_argument('--max-new-tokens', type=int, default=64)
    ap.add_argument('--tp', type=int, default=1)
    ap.add_argument('--pp', type=int, default=1,
                    help='pipeline stages (bubble-free microbatch-ring '
                         'decode, parallel/pp.py)')
    ap.add_argument('--dp', type=int, default=1)
    ap.add_argument('--greedy', action='store_true')
    args = ap.parse_args()

    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.messages import GenerationConfig

    engine = build_engine(args.model_path,
                          engine_config=None
                          if args.tp == args.pp == args.dp == 1
                          else EngineConfig(tp=args.tp, pp=args.pp,
                                            dp=args.dp))
    inst = engine.create_instance()
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           top_k=1 if args.greedy else 40)
    results = [None] * len(args.prompts)

    def run(i, prompt):
        ids = engine.tokenizer.encode(
            engine.chat_template.get_prompt(prompt))
        out = inst.infer(i + 1, ids, gen_config=gen, sequence_end=True)
        results[i] = engine.tokenizer.decode(out.token_ids)

    threads = [threading.Thread(target=run, args=(i, p))
               for i, p in enumerate(args.prompts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for prompt, result in zip(args.prompts, results):
        print(f'>>> {prompt}\n{result}\n')
    engine.shutdown()


if __name__ == '__main__':
    main()

"""CLI dispatcher: ``lmdeploy-tpu <command> ...``

Commands mirror the reference's python -m entrypoints:
  chat      interactive terminal chat       (lmdeploy.turbomind.chat)
  convert   checkpoint -> workspace         (lmdeploy.serve.turbomind.deploy)
  serve     OpenAI-compatible API server    (lmdeploy.serve.openai.api_server)
  lite      quantization toolkit            (lmdeploy.lite)
  chat-baseline  HF eager baseline chat     (lmdeploy.pytorch.chat)

Benchmarks live in benchmark/ (profile_generation / throughput / serving).
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ('-h', '--help'):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == 'chat':
        from .chat import main as chat_main
        return chat_main(rest[0], **_kw(rest[1:]))
    if cmd == 'convert':
        from ..convert.converter import main as conv_main
        return conv_main(rest)
    if cmd == 'serve':
        from ..serve.openai.api_server import main as serve_main
        return serve_main(rest[0], **_kw(rest[1:]))
    if cmd == 'lite':
        from ..lite.cli import main as lite_main
        return lite_main(rest)
    if cmd == 'chat-baseline':
        from ..pytorch.chat import main as pt_main
        return pt_main(rest[0], **_kw(rest[1:]))
    print(f'unknown command: {cmd}\n{__doc__}')
    return 1


def _kw(rest):
    out = {}
    i = 0
    while i < len(rest):
        if rest[i].startswith('--'):
            key = rest[i][2:].replace('-', '_')
            val = rest[i + 1] if i + 1 < len(rest) else 'true'
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
            out[key] = val
            i += 2
        else:
            i += 1
    return out


if __name__ == '__main__':
    raise SystemExit(main())

"""Gradio web UI (reference: lmdeploy/serve/gradio/app.py:91).

gradio is not installed in every deployment; the module degrades to a
clear error.  The UI drives AsyncEngine directly (the reference's
restful/Triton variants collapse onto the same engine here).
"""
from __future__ import annotations

import threading

from ..async_engine import AsyncEngine


def run_server(model_path: str, server_name: str = '0.0.0.0',
               server_port: int = 6006, tp: int = 1, **engine_kw):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            'gradio is not installed; use the OpenAI server instead: '
            'python -m lmdeploy_tpu.serve.openai.api_server') from e

    engine = AsyncEngine(model_path, tp=tp, **engine_kw)
    lock = threading.Lock()
    session_counter = [0]

    async def chat(message, history, session_state):
        if session_state is None:
            with lock:
                session_counter[0] += 1
                session_state = session_counter[0]
        text = ''
        async for out in engine.generate_openai(message, session_state):
            text += out.response
            yield text, session_state

    with gr.Blocks(title='lmdeploy-tpu') as demo:
        state = gr.State(None)
        chatbot = gr.Chatbot()
        box = gr.Textbox(label='prompt')

        async def respond(message, chat_history, session_state):
            final = ''
            async for text, session_state in chat(message, chat_history,
                                                  session_state):
                final = text
            chat_history = chat_history + [(message, final)]
            return '', chat_history, session_state

        box.submit(respond, [box, chatbot, state], [box, chatbot, state])
    demo.queue().launch(server_name=server_name, server_port=server_port)


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu gradio app')
    ap.add_argument('model_path')
    ap.add_argument('--server-name', default='0.0.0.0')
    ap.add_argument('--server-port', type=int, default=6006)
    ap.add_argument('--tp', type=int, default=1)
    a = ap.parse_args()
    run_server(a.model_path, a.server_name, a.server_port, a.tp)

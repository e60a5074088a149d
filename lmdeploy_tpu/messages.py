"""Request / response message types shared across engine and serving layers.

TPU-native equivalent of the reference's per-request TensorMap protocol
(reference: lmdeploy/turbomind/turbomind.py:284-319 builds input tensors
CORRID/START/END/STOP, top_k/top_p/temperature/repetition_penalty,
random_seed, stop/bad words) and serve/async_engine.py's GenOut.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence


class ResponseType(enum.IntEnum):
    """Per-request status codes (reference: Request.h:28-35 error codes)."""
    SUCCESS = 0
    FINISH = 1
    CANCELED = 2
    SESSION_REPEAT = 3       # duplicated session id among unfinished requests
    SESSION_BUSY = 4         # session already has an active request
    SESSION_NOT_EXIST = 5    # continuation of an unknown session
    INPUT_TOO_LONG = 6
    INTERNAL_ERROR = 7
    QUEUE_FULL = 8           # backpressure: pending-request bound hit
    TIMEOUT = 9              # request waited in the queue past its deadline


@dataclasses.dataclass
class GenerationConfig:
    """Sampling / generation parameters for one request."""
    max_new_tokens: int = 512
    top_k: int = 40
    top_p: float = 0.8
    min_p: float = 0.0
    temperature: float = 0.8
    repetition_penalty: float = 1.0
    # additive penalty on previously-seen tokens (the reference's
    # RepetitionPenaltyType::Additive, BaseSamplingLayer.cc:177-179 —
    # selected there by passing `presence_penalty` instead of
    # `repetition_penalty`); 0 disables
    presence_penalty: float = 0.0
    # OpenAI count-scaled additive penalty: each seen token's logit drops
    # by frequency_penalty * times_seen (beyond-reference: the reference
    # carries the protocol field but never applies it); 0 disables
    frequency_penalty: float = 0.0
    ignore_eos: bool = False
    random_seed: Optional[int] = None
    stop_words: Optional[List[int]] = None   # token ids that stop generation
    bad_words: Optional[List[int]] = None    # token ids banned from sampling
    min_new_tokens: int = 0
    output_logprobs: bool = False
    # number of top alternative tokens (+ logprobs) to return per
    # GENERATED token (OpenAI top_logprobs; 0 = chosen-token logprob
    # only).  Clipped to MAX_TOP_LOGPROBS by the engine; implies
    # output_logprobs
    top_logprobs: int = 0

    def clip(self, vocab_size: int) -> 'GenerationConfig':
        """Clamp values into legal ranges."""
        out = dataclasses.replace(self)
        out.top_k = max(0, min(out.top_k if out.top_k else vocab_size, 1024))
        out.top_p = float(min(max(out.top_p, 1e-5), 1.0))
        out.temperature = float(max(out.temperature, 1e-5))
        out.top_logprobs = max(0, int(out.top_logprobs or 0))
        return out


@dataclasses.dataclass
class EngineRequest:
    """One unit of work for the scheduler (reference: Request.h:15-37)."""
    session_id: int
    input_ids: Sequence[int]
    gen_config: GenerationConfig
    sequence_start: bool = True
    sequence_end: bool = False
    stop: bool = False          # cancel flag (reference STOP tensor)
    step: int = 0               # KV offset for interactive continuation
    return_logits: bool = False


@dataclasses.dataclass
class EngineOutput:
    """Streamed engine output for one request step."""
    status: ResponseType
    token_ids: List[int]
    num_generated: int
    finished: bool = False
    logits: Optional[object] = None     # [prompt_len, vocab] when requested
    logprobs: Optional[list] = None
    # per generated token: {token_id: logprob} dicts of the top-N
    # alternatives (GenerationConfig.top_logprobs > 0)
    top_logprobs: Optional[list] = None


@dataclasses.dataclass
class GenOut:
    """Serving-layer streamed output (reference: serve/async_engine.py:12-19)."""
    response: str
    history_token_len: int
    input_token_len: int
    generate_token_len: int
    finish_reason: Optional[str] = None  # 'stop' | 'length' | 'cancel' | None
    token_ids: Optional[list] = None     # NEW tokens this frame
    logprobs: Optional[list] = None      # their logprobs (when requested)
    top_logprobs: Optional[list] = None  # their top-N alternative dicts

"""OpenAI API protocol models.

Field-parity with the reference (lmdeploy/serve/openai/protocol.py):
model list, chat completions (stream + non-stream), embeddings, and the
non-OpenAI /generate interactive endpoint.
"""
from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field


def _gen_id(prefix: str) -> str:
    return f'{prefix}{uuid.uuid4().hex[:22]}'


class ErrorResponse(BaseModel):
    object: str = 'error'
    message: str
    code: int


class ModelPermission(BaseModel):
    id: str = Field(default_factory=lambda: _gen_id('modelperm-'))
    object: str = 'model_permission'
    created: int = Field(default_factory=lambda: int(time.time()))
    allow_create_engine: bool = False
    allow_sampling: bool = True
    allow_logprobs: bool = True
    allow_search_indices: bool = True
    allow_view: bool = True
    allow_fine_tuning: bool = False
    organization: str = '*'
    group: Optional[str] = None
    is_blocking: bool = False


class ModelCard(BaseModel):
    id: str
    object: str = 'model'
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = 'lmdeploy-tpu'
    root: Optional[str] = None
    parent: Optional[str] = None
    permission: List[ModelPermission] = Field(default_factory=list)


class ModelList(BaseModel):
    object: str = 'list'
    data: List[ModelCard] = Field(default_factory=list)


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    total_tokens: int = 0
    completion_tokens: Optional[int] = 0


class ChatCompletionRequest(BaseModel):
    model: str
    messages: Union[str, List[Dict[str, str]]]
    temperature: Optional[float] = 0.7
    top_p: Optional[float] = 1.0
    n: Optional[int] = 1
    max_tokens: Optional[int] = 512
    # bool = interrupt the session (lmdeploy extension, reference
    # protocol.py); str / list of str = OpenAI stop strings, expanded to
    # stop token sequences by the tokenizer
    stop: Optional[Union[bool, str, List[str]]] = False
    stream: Optional[bool] = False
    presence_penalty: Optional[float] = 0.0
    frequency_penalty: Optional[float] = 0.0
    user: Optional[str] = None
    # additional parameters supported by lmdeploy
    repetition_penalty: Optional[float] = 1.0
    renew_session: Optional[bool] = False
    ignore_eos: Optional[bool] = False
    # lmdeploy-tpu extension (the reference exposes top_k only on
    # /generate): top_k=1 requests greedy decoding, which unlocks the
    # engine's greedy fast paths (speculative verify, pp ring decode)
    top_k: Optional[int] = 40
    # OpenAI chat logprobs: return per generated token its logprob, and
    # with top_logprobs (0-5 here; OpenAI caps at 20) the N most likely
    # alternatives at that position
    logprobs: Optional[bool] = False
    top_logprobs: Optional[int] = None


class ChatMessage(BaseModel):
    role: str
    content: str


class ChatCompletionResponseChoice(BaseModel):
    index: int
    message: ChatMessage
    finish_reason: Optional[Literal['stop', 'length']] = None
    logprobs: Optional[Any] = None       # {'content': [...]} OpenAI shape


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _gen_id('chatcmpl-'))
    object: str = 'chat.completion'
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionResponseChoice]
    usage: UsageInfo


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None


class ChatCompletionResponseStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    finish_reason: Optional[Literal['stop', 'length']] = None
    logprobs: Optional[Any] = None       # {'content': [...]} OpenAI shape


class ChatCompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: _gen_id('chatcmpl-'))
    object: str = 'chat.completion.chunk'
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionResponseStreamChoice]


class CompletionRequest(BaseModel):
    model: str
    prompt: Union[str, List[str]]
    suffix: Optional[str] = None
    temperature: Optional[float] = 0.7
    n: Optional[int] = 1
    max_tokens: Optional[int] = 16
    # bool = interrupt the session (lmdeploy extension); str / list of
    # str = OpenAI stop strings (same contract as chat completions)
    stop: Optional[Union[bool, str, List[str]]] = False
    stream: Optional[bool] = False
    top_p: Optional[float] = 1.0
    logprobs: Optional[int] = None
    echo: Optional[bool] = False
    presence_penalty: Optional[float] = 0.0
    frequency_penalty: Optional[float] = 0.0
    user: Optional[str] = None
    repetition_penalty: Optional[float] = 1.0
    ignore_eos: Optional[bool] = False
    # lmdeploy-tpu extension, same contract as ChatCompletionRequest
    top_k: Optional[int] = 40


class CompletionResponseChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[Any] = None
    finish_reason: Optional[Literal['stop', 'length']] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _gen_id('cmpl-'))
    object: str = 'text_completion'
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[CompletionResponseChoice]
    usage: UsageInfo


class CompletionResponseStreamChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[Any] = None
    finish_reason: Optional[Literal['stop', 'length']] = None


class CompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: _gen_id('cmpl-'))
    object: str = 'text_completion'
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[CompletionResponseStreamChoice]


class EmbeddingsRequest(BaseModel):
    model: Optional[str] = None
    input: Union[str, List[str]]
    user: Optional[str] = None


class EmbeddingsResponse(BaseModel):
    object: str = 'list'
    data: List[Dict[str, Any]]
    model: str
    usage: UsageInfo


class GenerateRequest(BaseModel):
    prompt: Union[str, List[Dict[str, str]]]
    instance_id: int = -1
    sequence_start: bool = True
    sequence_end: bool = False
    stream: bool = False
    stop: bool = False
    request_output_len: int = 512
    top_p: float = 0.8
    top_k: int = 40
    temperature: float = 0.8
    repetition_penalty: float = 1.0
    ignore_eos: bool = False


class GenerateResponse(BaseModel):
    text: str
    tokens: int
    finish_reason: Optional[Literal['stop', 'length', 'cancel']] = None

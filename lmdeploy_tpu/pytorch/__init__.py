"""HF-transformers eager baseline backend.

Reference: lmdeploy/pytorch/ (~2.2k LoC) — a simple torch backend used
for baseline chat and perplexity evaluation, independent of the main
engine.  Kept as the numerics oracle: the TPU engine's logits are
validated against this path (tests/test_model_parity.py uses the same
idea with in-process HF models)."""

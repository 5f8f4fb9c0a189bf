"""LLaMA-family LLM runtime (GGUF loader, tokenizer, fused generation).

TPU-native counterpart of the llama.cpp build vendored by the
reference's talk-llama example (/root/reference/examples/talk-llama/).
"""

from .model import (LlamaConfig, LlamaContext, SampleParams,  # noqa: F401
                    config_from_gguf, forward, generate_chunk,
                    init_kv_cache, init_params, params_from_gguf)
from .tokenizer import LlamaVocab  # noqa: F401

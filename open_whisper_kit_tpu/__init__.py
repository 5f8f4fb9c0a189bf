"""open-whisper-kit-tpu: TPU-native speech framework.

Speech-to-text (Whisper), voice-activity detection (Silero), word-level
timestamps, streaming SortFormer diarization, and speaker-attributed
transcripts — rebuilt for TPU on JAX/XLA/Pallas. See README.md.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("OWK_JAX_CACHE_DIR"):
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["OWK_JAX_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import api  # noqa: F401

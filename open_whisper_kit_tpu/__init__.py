"""open-whisper-kit-tpu: TPU-native speech framework.

Speech-to-text (Whisper), voice-activity detection (Silero), word-level
timestamps, streaming SortFormer diarization, and speaker-attributed
transcripts — rebuilt for TPU on JAX/XLA/Pallas. See README.md.
"""

__version__ = "0.1.0"

from . import api  # noqa: F401

"""esp32_opus_player_tpu — TPU-native Ogg/Opus decode framework.

A from-scratch re-design of the ESP32-Opus-Player reference decoder stack
for TPU hardware: host-side container/entropy layers feeding batched,
bit-exact fixed-point JAX/XLA synthesis kernels over thousands of
concurrent streams (see SURVEY.md / README.md).
"""
from .api import (DecoderConfig, OpusFile, decode_file, decode_to_wav,
                  write_wav)
from .models.opus_decoder import OpusDecoder

__all__ = [
    "DecoderConfig", "OpusFile", "OpusDecoder", "decode_file",
    "decode_to_wav", "write_wav",
]
__version__ = "0.1.0"

"""avsi — a TPU-native audio-visual speech-inpainting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
dr-pato/audio-visual-speech-inpainting (Morrone et al., arXiv 2010.04556):
time-gap speech inpainting on GRID with audio / visual / audio-visual BLSTM
models, speaker conditioning (learned SSNN or external embeddings), CTC
multi-task heads, a spectrogram U-Net, a standalone CTC ASR evaluator, and
the full offline data/eval toolchain.

Design (see SURVEY.md §7):
  * feature extraction (STFT -> log-spectrogram -> normalize -> mask) is fused
    into the jitted train/infer step; raw waveforms are the batch input
    (mirrors reference models.py:30-35, but compiled instead of graph-built);
  * STFT/iSTFT are windowed-DFT matmuls on the MXU (ops/stft.py), not FFT ops;
  * one bidirectional-LSTM core as a `lax.scan` (models/core.py) replaces the
    CudnnLSTM / CudnnCompatibleLSTMCell dual graph (reference models.py:94-115);
  * data parallelism via `jax.sharding.Mesh` + jit sharding constraints
    (parallel/mesh.py); the reference is single-device (SURVEY.md §2.4).
"""

__version__ = "0.1.0"

AUDIO_SAMPLE_RATE = 16_000

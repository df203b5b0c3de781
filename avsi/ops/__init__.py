from avsi.ops import mel, masks, stft  # noqa: F401

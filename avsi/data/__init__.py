from avsi.data import avsync, landmarks, masks, phonemes, tfrecord  # noqa: F401

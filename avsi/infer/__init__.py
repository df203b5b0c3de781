from avsi.infer import asr, inpaint, masking, siasr  # noqa: F401

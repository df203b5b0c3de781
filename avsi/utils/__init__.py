from avsi.utils import wav  # noqa: F401

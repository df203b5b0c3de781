from avsi.parallel import mesh  # noqa: F401

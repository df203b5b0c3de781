from avsi.eval import harness, metrics  # noqa: F401

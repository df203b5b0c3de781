from avsi.train import checkpoints, loop, state  # noqa: F401
from avsi.train.loop import train  # noqa: F401

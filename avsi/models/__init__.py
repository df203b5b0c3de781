from avsi.models import asr, blstm, core, registry, twosteps, unet  # noqa: F401
from avsi.models.registry import get_asr_model, get_model  # noqa: F401

from avsi.models import asr, blstm, core, registry, twosteps, unet, unet_pconv  # noqa: F401
from avsi.models.registry import get_asr_model, get_model  # noqa: F401

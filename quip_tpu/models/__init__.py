from quip_tpu.models.config import ModelConfig, PRESETS, get_config  # noqa: F401
from quip_tpu.models import model as model_lib  # noqa: F401

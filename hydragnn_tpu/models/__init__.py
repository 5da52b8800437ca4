from hydragnn_tpu.models.create import create_model, create_model_config
from hydragnn_tpu.models.base import HydraBase

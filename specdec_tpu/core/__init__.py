from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.cache import KVCache
from specdec_tpu.core.model import forward_full, forward_step, init_params

from mdd_tpu.utils.config import Config, load_config

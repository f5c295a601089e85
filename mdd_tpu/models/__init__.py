from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig

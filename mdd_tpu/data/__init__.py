from mdd_tpu.data.vocab import Vocab

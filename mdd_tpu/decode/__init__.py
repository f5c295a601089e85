from mdd_tpu.decode.greedy import greedy_decode, collapse_ctc
from mdd_tpu.decode.arpa import ArpaBigramLM
from mdd_tpu.decode.beam import BeamSearchDecoder

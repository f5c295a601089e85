from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank, compute_fbank_batch
from mdd_tpu.frontend.cmvn import CmvnStats, apply_cmvn, parse_kaldi_cmvn_text, write_kaldi_cmvn_text
from mdd_tpu.frontend.splice import make_context, skip_frames, pad_to_multiple
from mdd_tpu.frontend.augment import spec_augment, mutate_transcript

from mdd_tpu.ops.lstm import lstm_scan, bilstm
from mdd_tpu.ops.ctc_loss import ctc_loss, ctc_loss_sum_mean
from mdd_tpu.ops.attention import dot_attention

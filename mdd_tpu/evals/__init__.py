from mdd_tpu.evals.wer import corpus_wer, WerStats, format_per_report, read_trn
from mdd_tpu.evals.analysis import hierarchical_mdd_analysis, HierarchicalMdd

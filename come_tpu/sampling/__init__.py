from come_tpu.sampling.alias import build_alias_table, sample_alias, unigram_weights
from come_tpu.sampling.walks import random_walks
from come_tpu.sampling.windows import skipgram_pairs, subsample_keep_probs

__all__ = [
    "build_alias_table",
    "sample_alias",
    "unigram_weights",
    "random_walks",
    "skipgram_pairs",
    "subsample_keep_probs",
]

"""Data pipeline: CoNLL/VLParse loading, vocabularies, bucketed batching."""

from .conll import read_conll, write_conll_rows
from .datamodule import DataModule, DepDataModule, VLParseDataModule, normalize_word
from .features import DetFeatureLoader
from .sampler import BasicSampler, ConstantTokenNumSampler, kmeans_1d
from .vocab import TokenVocabulary, Vocabulary

__all__ = [
    "read_conll",
    "write_conll_rows",
    "DataModule",
    "DepDataModule",
    "VLParseDataModule",
    "normalize_word",
    "DetFeatureLoader",
    "BasicSampler",
    "ConstantTokenNumSampler",
    "kmeans_1d",
    "Vocabulary",
    "TokenVocabulary",
]

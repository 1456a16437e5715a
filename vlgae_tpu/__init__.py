"""vlgae_tpu: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
vision-language parsing, re-designed from scratch with the capabilities of
the VLGAE reference implementation (CVPR 2022, LouChao98/VLGAE).

Layers (bottom to top):
  - ``struct``:   semirings + chart dynamic programs (DMV, Eisner) +
                  structured distributions. The O(n^3) inside pass is the
                  performance-critical kernel surface.
  - ``ops``:      Pallas TPU kernels for the chart fills.
  - ``models``:   neural modules (embeddings, encoders, DMV scorers,
                  the joint vision-language model).
  - ``data``:     CoNLL/VLParse data pipeline, vocabularies, bucketing.
  - ``parallel``: mesh / sharding utilities (pure data-parallel psum).
  - ``training``: train state, optimizers, metrics, checkpointing.
  - ``utils``:    config system (hydra-compatible), schedules, logging.
"""

__version__ = "0.1.0"

"""gcnbmp_tpu — a TPU-native graph message-passing framework.

A from-scratch JAX/XLA/Pallas framework providing the model families and
pipelines of the GCN-BMP drug-drug-interaction codebase (reference:
Minys233/GCN-BMP), redesigned TPU-first:

- ``chem``     SMILES -> molecular graph featurization (no RDKit dependency;
               pure-Python reference parser + native C++ fast path).
- ``data``     pair-CSV parsing, pad/bucket batching, packed supergraph
               layout, dataset splitting tools.
- ``ops``      Pallas kernels + XLA ops for the hot paths: edge-type
               message aggregation (SpMM), fused GRU, gated readout,
               circular correlation, co-attention affinity.
- ``models``   flax.linen modules: GGNN/RelGCN/GIN/MPNN/NFP encoders,
               co-attention family, link-prediction heads, pair predictor.
- ``train``    typed configs, training loop, metrics, checkpoints, LR
               schedules (exponential-shift + cyclical).
- ``parallel`` jax.sharding meshes, data-parallel and edge-partitioned
               train steps.
- ``eval``     offline evaluation, embedding export, saliency, similarity.
"""

__version__ = "0.1.0"

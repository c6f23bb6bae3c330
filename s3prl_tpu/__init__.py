"""s3prl_tpu — a TPU-native self-supervised speech representation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of s3prl/s3prl:
an upstream zoo of SSL speech models exposing per-layer hidden states behind a
single batched API, a learnable weighted-sum featurizer, SUPERB downstream
recipes, and in-repo SSL pretraining — built for TPU hardware: static bucketed
shapes, masked attention, bf16 on the MXU, and `jax.sharding` data/tensor
parallelism over device meshes instead of NCCL DDP.

Public surface (mirrors the reference's packaged API, s3prl/nn + s3prl/hub):

    from s3prl_tpu import hub
    from s3prl_tpu.nn import SUpstream, Featurizer

Reference layer map: /root/reference (see SURVEY.md in the repo root).
"""

__version__ = "0.1.0"

SAMPLE_RATE = 16000

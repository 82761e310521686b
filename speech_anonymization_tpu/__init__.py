"""speech_anonymization_tpu — TPU-native adversarial speech anonymization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference repo (viswavi/speech-anonymization, a SpeechBrain-0.5 recipe
stack): log-mel feature frontend, autoencoder anonymizers with
gradient-reversal sex classifiers, x-vector privacy evaluator, transformer
ASR utility stack with CTC+LM beam search, MI privacy losses, and the five
training/eval recipes — all redesigned TPU-first (SPMD data parallelism over
a jax.sharding.Mesh, static-shape bucketing, GEMM-native feature extraction,
Pallas kernels on the hot paths).

Layer map (mirrors SURVEY.md §1):
  ops/       device ops: fbank frontend, GRL, pooling, normalization, augment
  models/    pure flax models: autoencoders, sex classifiers, x-vector, ASR
  losses/    recon/sex/utility/confusion losses, CTC, KLdiv, MI estimators
  decoding/  fixed-shape batched beam search with CTC + LM fusion
  train/     Brain-style trainer, schedulers, checkpointing, logging
  parallel/  mesh construction, sharding, host-gated IO
  data/      manifests, dataset pipelines, bucketing, tokenizer, audio IO
  eval/      metrics (WER/ACC/similarity), feature-level classifier inference
  config/    registry-based YAML config system (HyperPyYAML-equivalent)
"""

__version__ = "0.1.0"

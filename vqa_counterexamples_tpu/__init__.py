"""vqa_counterexamples_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
VQA counterexample prediction (VQA-CX).

Re-designed from scratch with the capabilities of the reference CUDA/PyTorch
codebase (gabegrand/VQA-Counterexamples): feature extraction, kNN, MUTAN/MLB
VQA classifiers, the 9-model CX zoo, training/eval engines, checkpointing,
logging, visualization and serving — built TPU-first:

  * static shapes everywhere (B x 25 x 2048 features, 26-token questions,
    2000-answer heads) so XLA tiles onto the MXU;
  * the per-candidate Python loops of the reference become single batched
    einsums (ops/scorer.py, ops/fusion.py);
  * the feature matrix is device-resident in HBM and batches gather on-device
    by index inside the jitted step (no per-batch host gather / H2D copies);
  * data/model parallelism via jax.sharding.Mesh + pjit over TPU ICI.
"""

__version__ = "0.1.0"

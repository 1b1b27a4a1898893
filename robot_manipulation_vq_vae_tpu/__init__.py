"""robot_manipulation_vq_vae_tpu: a TPU-native (JAX / Flax / pjit / Pallas) framework
with the capabilities of the LipVQ-VAE in-context imitation-learning stack
("Action Tokenizer Matters in In-Context Imitation Learning", IROS 2025).

This is NOT a port of the PyTorch reference; it is a re-design around XLA's
compilation model:

  * pure, jitted train/eval steps over explicit state pytrees,
  * mutable codebook/EMA state carried in Flax variable collections,
  * Pallas TPU kernels for the hot codebook-quantization ops,
  * scale-out via ``jax.sharding.Mesh`` + batch-sharded data parallelism.

Layer map (mirrors reference SURVEY.md numbering):
  config/    -- locking Config dict + registry + JSON template override   (L7)
  data/      -- HDF5 SequenceDataset / MetaDataset / normalization        (L3)
  models/    -- obs encoders, GPT backbone, actor nets, tokenizers        (L4)
  ops/       -- quantization math: XLA reference impls + Pallas kernels
  algo/      -- Algo registry, ICL family, BC family, rollout policies    (L5)
  parallel/  -- device mesh, sharding rules, pjit train steps
  envs/      -- EnvBase protocol + wrappers (host-side MuJoCo stays CPU)  (L2)
  utils/     -- tensor/obs/train/log/file utilities                      (L6)
  scripts/   -- train / eval CLIs, config generation                      (L8)
"""

__version__ = "0.1.0"

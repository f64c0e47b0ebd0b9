"""mme_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multi-modal emotion framework.

A from-scratch rebuild of the capabilities of the reference PyTorch codebase
``g8a9/multi-modal-emotion`` (MELD / IEMOCAP / MUStARD++ / Hateful Memes
emotion, sentiment, sarcasm, and hateful-meme classification), re-designed
TPU-first:

- static-shape, bucketed, HBM-resident batches (no per-batch Python collate),
- flax.linen encoders (text / audio / video / image / visualbert) with
  HF-checkpoint weight import,
- Pallas flash attention with modality-block masks for the fusion trunk,
- one generic jitted train step (optax AdamW + cosine warm restarts) with the
  reference's training policies (epoch-parity sampler/loss/accumulation,
  mid-epoch validate/checkpoint/patience, best-reload),
- data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with psum metric
  reduction.

Package map (mirrors SURVEY.md §7):
    core/      typed configs (reference CLI flag contract), PRNG policy, registry
    data/      record building, synthetic datasets, host pipeline
    ops/       Pallas/XLA kernels (attention, audio conv stack, masks, patchify)
    models/    flax.linen model zoo + fusion stack
    parallel/  mesh + sharding + collectives
    train/     loop policies, losses, schedules, checkpointing
    evals/     metrics (confusion-matrix engine, reference-keyed score dicts)
    cli/       entry points preserving the reference CLI surface
"""

__version__ = "0.1.0"

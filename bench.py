"""North-star benchmark: LipVQ-VAE action-chunk tokenize + detokenize
throughput on one chip.

Target (BASELINE.json "north_star"): >= 10,000 action chunks/sec/chip for the
full roundtrip (encoder MLP -> Lipschitz latent -> nearest-code search over a
1024 x 210 codebook -> decoder MLP), at the shipped-config sizes
(feature_dim=12, latent_dim=210, num_codes=1024).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.utils.train_utils import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from robot_manipulation_vq_vae_tpu.models.tokenizers import LipVQVAE

    FEATURE_DIM = 12
    LATENT_DIM = 210   # obs-feature dim of the shipped config (3x64 cams + 18 low-dim)
    NUM_CODES = 1024
    BATCH = 65536      # chunks per device step

    on_tpu = jax.default_backend() not in ("cpu",)
    model = LipVQVAE(
        feature_dim=FEATURE_DIM,
        latent_dim=LATENT_DIM,
        num_codes=NUM_CODES,
        use_pallas=on_tpu,
    )
    rng = jax.random.PRNGKey(0)
    x_init = jnp.zeros((8, FEATURE_DIM), jnp.float32)
    variables = model.init(rng, x_init)

    # fused Pallas megakernel on TPU (whole tokenize+detokenize VMEM-resident,
    # ~1.5x over the op-by-op path); standard path elsewhere
    method = model.roundtrip_fused if on_tpu else model.roundtrip

    @jax.jit
    def roundtrip(v, x):
        recon, idx = model.apply(v, x, method=method)
        return recon, idx

    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, FEATURE_DIM).astype(np.float32)
    )

    import functools

    @functools.partial(jax.jit, static_argnames="n")
    def chain(v, x, n):
        """n chained roundtrips ON DEVICE (lax.fori_loop): one dispatch, one
        scalar fetch - immune to per-call RPC jitter on tunneled backends.
        Feeding the reconstruction back as input serializes iterations."""

        def body(_, y):
            recon, _ = model.apply(v, y, method=method)
            return recon

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    n_short, n_long = (1, 5) if not on_tpu else (1, 401)
    # warmup/compile both trip counts
    float(chain(variables, x, n_short))
    float(chain(variables, x, n_long))

    t0 = time.perf_counter()
    float(chain(variables, x, n_short))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(variables, x, n_long))
    t_long = time.perf_counter() - t0
    per_iter = max((t_long - t_short) / (n_long - n_short), 1e-9)
    chunks_per_sec = BATCH / per_iter
    baseline = 10_000.0  # north-star target (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "lipvq_tokenize_detokenize_throughput",
                "value": round(chunks_per_sec, 1),
                "unit": "chunks/sec/chip",
                "vs_baseline": round(chunks_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

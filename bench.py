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

    @jax.jit
    def roundtrip(v, x):
        recon, idx = model.apply(v, x, method=model.roundtrip)
        return recon, idx

    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, FEATURE_DIM).astype(np.float32)
    )

    reduce = jax.jit(lambda r: jnp.sum(r))

    def run_chain(n):
        """n chained roundtrips + one scalar fetch. Feeding the
        reconstruction back as input (same shape as the input) forces truly
        sequential device execution; the scalar fetch is the only
        device->host sync (it is expensive on tunneled backends, so we
        amortize it by measuring two chain lengths and differencing)."""
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y, _ = roundtrip(variables, y)
        float(reduce(y))
        return time.perf_counter() - t0

    # warmup / compile both kernels + the fetch path
    run_chain(1)
    run_chain(1)

    n_short, n_long = (1, 6) if not on_tpu else (1, 201)
    t_short = run_chain(n_short)
    t_long = run_chain(n_long)
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

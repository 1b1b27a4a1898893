"""Flagship training-quality run (VERDICT r3 #6): several hundred
on-chip steps recording the loss curve and codebook telemetry every K
steps — evidence that HVQVAE co-training is STABLE over a real horizon
(loss descends, codebook utilization climbs, dead-code replacement
settles), beyond 12-step parity and 3-step smoke finiteness.

Telemetry matches the reference's per-epoch codebook logging
(robomimic/algo/icl.py:1281-1298, heirarchical_vqvae.py:687-706):
z/q utilization (fraction of codes above the EMA replace threshold) and
z/q dead-code counts, from ``get_codebook_usage`` over the live ``vq``
collections.

Batches are synthesized ON DEVICE (the tunnel makes host uploads measure
the network, not training) and CYCLED over --n_batches distinct seeds so
the codebooks see varied action data rather than overfitting one batch.

``--clustered`` (round-5, VERDICT r4 #2a) replaces the uniform actions
with draws from a small prototype set (a rotating subset per batch), so
most z-codes get ZERO assignments each step, their EMA mass decays below
the replace threshold, and dead-code replacement fires continuously.

WHY UTILIZATION CANNOT "DIP" IN THIS TELEMETRY: both this framework and
the reference sample codebook usage AFTER the train step
(robomimic/algo/icl.py:1290-1298), and replacement resets every starved
code's EMA mass to exactly 1.0 == the replace threshold
(heirarchical_vqvae.py:543-588) — so post-step ``z_dead`` is ~0 and
utilization ~1.0 BY CONSTRUCTION whenever replacement is working; a dip
would mean replacement is broken. The direct evidence that the machinery
fires is therefore the per-interval ``z_replaced``/``q_replaced`` counts
recorded here: codebook rows that JUMPED (L2 > 0.5 on the unit sphere)
between sample points — EMA drift alone moves a row by <= (1-decay) per
step toward assigned data; only replacement rewrites a row wholesale.
On clustered data these counts are in the hundreds per interval; on
uniform data they are near zero (kmeans init covers the data).

Usage (on chip, ~10 min incl. compile)::

    python -m robot_manipulation_vq_vae_tpu.scripts.training_quality_run \
        --steps 400 --every 50 --clustered \
        --out docs/training_quality_r5.json

The artifact records per-sample-point rows plus pass/fail stability
verdicts (final loss below initial, utilization non-degenerate, and —
in clustered mode — replacement demonstrably firing and recovering).
"""

import argparse
import json
import os
import sys
import time

# bench_train.py lives at the repo root (it is a driver-bench surface)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def run(args):
    import bench_train
    from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
        get_codebook_usage,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    algo, make_batch = bench_train.build_flagship(
        mixed_precision=args.bf16,
        batch_size=args.batch_size,
        context_length=args.context_length,
        img_hw=args.img,
    )

    def make_clustered(seed):
        """Same device-synthesized batch, but actions drawn from 12 of 24
        prototype sequences (per-batch rotating subset) + 2% noise — far
        fewer distinct token embeddings than z-codes, so codes starve each
        step and dead-code replacement fires continuously, while the data
        stays rich enough for the policy loss to descend."""
        batch = make_batch(seed)
        b, h, a = batch["actions"].shape
        key = jax.random.fold_in(jax.random.PRNGKey(1234), 0)
        protos = jax.random.uniform(
            key, (24, h, a), jnp.float32, -1, 1
        )
        sub = jax.random.choice(
            jax.random.fold_in(key, 100 + seed), 24, (12,), replace=False
        )
        assign = jax.random.choice(
            jax.random.fold_in(key, 200 + seed), sub, (b,)
        )
        noise = 0.02 * jax.random.normal(
            jax.random.fold_in(key, 300 + seed), (b, h, a)
        )
        batch["actions"] = jnp.take(protos, assign, axis=0) + noise
        return batch

    maker = make_clustered if args.clustered else make_batch
    batches = [maker(s) for s in range(args.n_batches)]

    rows = []
    prev_cb = {"z": None, "q": None}

    def _replaced_since_last(vq):
        """Codebook rows that JUMPED since the last sample point (L2 > 0.5
        on the unit sphere): replacement rewrites rows wholesale, EMA only
        drifts them — see module docstring."""
        out = {}
        for tag, key in (("z", "codebook_z"), ("q", "codebook_q")):
            cb = np.asarray(jax.device_get(vq[key]), np.float32)
            if prev_cb[tag] is None:
                out[tag] = 0
            else:
                jump = np.linalg.norm(cb - prev_cb[tag], axis=1)
                out[tag] = int(np.sum(jump > 0.5))
            prev_cb[tag] = cb
        return out

    def sample_point(step, loss):
        vq = algo.state.aux["vqvae"]["vq"]
        usage = get_codebook_usage(vq)
        replaced = _replaced_since_last(vq)
        cs_z = np.asarray(jax.device_get(vq["cluster_size_z"]), np.float32)
        row = {
            "step": step,
            "action_loss": round(float(loss), 5),
            "z_utilization": round(float(usage["z_utilization"]), 4),
            "q_utilization": round(float(usage["q_utilization"]), 4),
            "z_dead": int(usage["z_dead"]),
            "q_dead": int(usage["q_dead"]),
            "z_replaced": replaced["z"],
            "q_replaced": replaced["q"],
            "z_cluster_size_min": round(float(cs_z.min()), 4),
            "z_cluster_size_mean": round(float(cs_z.mean()), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    t0 = time.perf_counter()
    info = algo.train_on_batch(batches[0], epoch=0)  # init + compile
    loss0 = float(info["losses"]["action_loss"])
    compile_sec = time.perf_counter() - t0
    sample_point(1, loss0)

    t_steps = time.perf_counter()
    for step in range(2, args.steps + 1):
        info = algo.train_on_batch(
            batches[step % len(batches)], epoch=0
        )
        if step % args.every == 0 or step == args.steps:
            sample_point(step, info["losses"]["action_loss"])
    steps_per_sec = (args.steps - 1) / (time.perf_counter() - t_steps)

    first, last = rows[0], rows[-1]
    total_z_replaced = sum(r["z_replaced"] for r in rows)
    verdicts = {
        "loss_descended": last["action_loss"] < first["action_loss"],
        # non-degenerate codebooks: a healthy run keeps a sizable share
        # of codes live (dead-code replacement keeps resurrecting them)
        "z_utilization_healthy": last["z_utilization"] >= 0.5,
        "q_utilization_healthy": last["q_utilization"] >= 0.5,
        "dead_codes_bounded": (
            last["z_dead"] <= max(8, first["z_dead"])
            and last["q_dead"] <= max(8, first["q_dead"])
        ),
    }
    if args.clustered:
        # the point of clustered mode: replacement must demonstrably FIRE
        # (codes starve each step -> rows rewritten from batch samples)
        # and RECOVER them (post-step dead counts stay ~0 — see module
        # docstring for why that, not a utilization dip, is the signature)
        verdicts["replacement_fired"] = total_z_replaced >= 100
        verdicts["replacement_recovers"] = all(
            r["z_dead"] <= 8 for r in rows[1:]
        )

    result = {
        # provenance: a CPU-backend artifact is stability evidence, NOT
        # the on-chip measurement (the steps_per_sec field is only a perf
        # claim when backend is a TPU)
        "backend": jax.default_backend(),
        "config": {
            "steps": args.steps, "every": args.every,
            "batch_size": args.batch_size, "bf16": args.bf16,
            "n_batches": args.n_batches, "img": args.img,
            "context_length": args.context_length,
            "clustered": args.clustered,
        },
        "compile_sec": round(compile_sec, 1),
        "steps_per_sec": round(steps_per_sec, 3),
        "total_z_replaced": total_z_replaced,
        "total_q_replaced": sum(r["q_replaced"] for r in rows),
        "rows": rows,
        "verdicts": verdicts,
        "stable": all(verdicts.values()),
    }
    from robot_manipulation_vq_vae_tpu.utils.file_utils import (
        atomic_write_json,
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    atomic_write_json(args.out, result, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}),
          flush=True)
    if not result["stable"]:
        raise SystemExit(f"UNSTABLE: {verdicts}")
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--every", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_batches", type=int, default=8)
    p.add_argument("--img", type=int, default=128)
    p.add_argument("--context_length", type=int, default=16)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--clustered", action="store_true",
                   help="prototype-clustered actions: starves codes each "
                        "step so dead-code replacement visibly fires")
    p.add_argument("--out", default="docs/training_quality_r5.json")
    args = p.parse_args(argv)
    run(args)


if __name__ == "__main__":
    main()

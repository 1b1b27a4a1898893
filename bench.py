"""Driver benchmark. ONE JSON line with:

1. the north-star metric (primary fields): LipVQ-VAE action-chunk
   tokenize + detokenize throughput on one chip — target
   >= 10,000 chunks/sec/chip (BASELINE.json "north_star") at the
   shipped-config sizes (feature_dim=12, latent_dim=210, num_codes=1024);
2. a compiled-Pallas numerics assertion (TPU only): the fused roundtrip
   megakernel must match the plain-XLA path within the documented
   tanh-GELU tolerance, else this script FAILS — so a recorded bench
   result implies compiled-kernel correctness, not just speed;
3. flagship train-step throughput (extra fields): one
   ICLTransformerHVQVAE bf16 train step at the reference's shipped
   scale (batch 64, 3x128x128 cams, 6L/512d/8H, ctx 16) measured via
   bench_train.measure — the real workload, reference hot loop
   ``robomimic/utils/train_utils.py:1238-1328``.

Budget choreography: the flagship child pays a 150-300 s XLA compile
(the persistent compile cache does not survive processes on this
backend), so it is spawned at t=0 — BEFORE the parent even initializes
JAX — and runs concurrently with the tokenizer bench (the backend
multiplexes concurrent clients). The parent harvests the child's result
file at the budget deadline. Set RMVQ_BENCH_FLAGSHIP=0 to skip (3).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np


def _spawn_flagship():
    """Launch bench_train.py speculatively (it self-gates on CPU backends
    with rc=3). stdout/stderr go to FILES and the child gets its own
    process group: backend helper processes inherit pipes and would make
    a post-kill pipe read hang forever; killpg reaps them too."""
    out_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.out", delete=False
    )
    err_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.err", delete=False
    )
    result_path = out_f.name + ".json"
    child = subprocess.Popen(
        [sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_train.py",
        )],
        env={**os.environ,
             "RMVQ_REQUIRE_TPU": "1",   # exit rc=3 immediately on CPU
             "RMVQ_BF16": "1", "RMVQ_BATCH": "64",
             "RMVQ_RESULT_FILE": result_path},
        stdout=out_f, stderr=err_f, start_new_session=True,
    )
    return child, out_f, err_f, result_path


def _harvest_flagship(child, out_f, err_f, result_path, deadline, result):
    """Wait for the flagship child until `deadline` (absolute
    time.perf_counter() value), then merge its fields into `result`.
    Polls instead of blocking to the deadline, so a fast compile leaves
    budget for the opportunistic inference leg."""
    keep_files = False
    try:
        hard_deadline = max(deadline, time.perf_counter() + 30.0)
        while child.poll() is None:
            if time.perf_counter() >= hard_deadline:
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                raise subprocess.TimeoutExpired(cmd="bench_train", timeout=0)
            time.sleep(2.0)
        rc = child.returncode
        if rc == 3:
            return  # CPU backend: flagship deliberately skipped
        flagship = None
        if os.path.exists(result_path):
            with open(result_path) as f:
                flagship = json.load(f)
        if flagship is None:
            out_f.seek(0)
            lines = [ln for ln in out_f.read().splitlines()
                     if ln.startswith("{")]
            if rc != 0 or not lines:
                err_f.seek(0)
                raise RuntimeError(
                    f"bench_train rc={rc}: {err_f.read().strip()[-200:]}"
                )
            flagship = json.loads(lines[-1])
        result["flagship_train_steps_per_sec"] = flagship["value"]
        result["flagship_samples_per_sec"] = flagship["samples_per_sec"]
        result["flagship_compile_sec"] = flagship["compile_sec"]
        result["flagship_mixed_precision"] = flagship["mixed_precision"]
        if "tflops_per_sec" in flagship:
            # achieved TFLOP/s from XLA's own FLOP count of the compiled
            # step (v5e bf16 peak is ~197 TFLOP/s/chip)
            result["flagship_tflops_per_sec"] = flagship["tflops_per_sec"]
    except subprocess.TimeoutExpired:
        keep_files = True
        result["flagship_error"] = (
            "flagship child hit the bench deadline "
            "(XLA compile variance over the tunnel)"
        )
    except Exception as e:  # never lose the north-star number
        keep_files = True
        result["flagship_error"] = f"{type(e).__name__}: {e}"[:300]
    finally:
        for f in (out_f, err_f):
            try:
                f.close()
            except Exception:
                pass
        if not keep_files:  # keep logs only on failure, for debugging
            for p in (out_f.name, err_f.name, result_path):
                try:
                    os.unlink(p)
                except OSError:
                    pass


_STATE = {"result": {}, "printed": False, "child_result_path": None,
           "child": None, "phase": "startup"}


def _emit(result):
    if not _STATE["printed"]:
        _STATE["printed"] = True
        print(json.dumps(result), flush=True)


def _watchdog(deadline_monotonic):
    """Guarantee ONE JSON line before the driver's timeout even if the main
    thread is stuck inside a blocking XLA compile (the compile service
    serializes the parent's and the flagship child's compiles, so a slow
    day can pin the main thread past the budget). Harvests the child's
    result file so the flagship numbers land regardless."""
    import threading

    def run():
        while time.perf_counter() < deadline_monotonic:
            if _STATE["printed"]:
                return
            time.sleep(1.0)
        if _STATE["printed"]:
            return
        result = dict(_STATE["result"])
        path = _STATE["child_result_path"]
        try:
            if path and os.path.exists(path):
                with open(path) as f:
                    flagship = json.load(f)
                result["flagship_train_steps_per_sec"] = flagship["value"]
                result["flagship_samples_per_sec"] = (
                    flagship["samples_per_sec"]
                )
                result["flagship_compile_sec"] = flagship["compile_sec"]
                result["flagship_mixed_precision"] = (
                    flagship["mixed_precision"]
                )
                if "tflops_per_sec" in flagship:
                    result["flagship_tflops_per_sec"] = (
                        flagship["tflops_per_sec"]
                    )
        except Exception:
            pass
        result.setdefault(
            "metric", "lipvq_tokenize_detokenize_throughput"
        )
        result.setdefault("value", None)
        result.setdefault("unit", "chunks/sec/chip")
        result.setdefault("vs_baseline", None)
        result["watchdog"] = (
            f"main thread stuck in phase '{_STATE.get('phase')}' at "
            "deadline; partial results (a hang before 'device_warmup' "
            "completes usually means the TPU tunnel/backend is "
            "unreachable, not a slow compile)"
        )
        _emit(result)
        child = _STATE["child"]
        if child is not None and child.poll() is None:
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                pass
        os._exit(0)

    t = threading.Thread(target=run, daemon=True)
    t.start()


def main():
    bench_start = time.perf_counter()
    budget = float(os.environ.get("RMVQ_BENCH_BUDGET_SEC", "560"))
    _watchdog(bench_start + budget - 5.0)

    # (3) flagship child at t=0 — before the parent touches JAX — so its
    # 150-300 s compile overlaps the whole tokenizer bench below.
    child = None
    if os.environ.get("RMVQ_BENCH_FLAGSHIP", "1") == "1":
        child, out_f, err_f, result_path = _spawn_flagship()
        _STATE["child"] = child
        _STATE["child_result_path"] = result_path

    _STATE["phase"] = "importing_jax"
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.utils.train_utils import (
        enable_compile_cache,
    )

    enable_compile_cache()
    _STATE["phase"] = "device_warmup"
    # first device contact: a hang HERE (not in a compile) indicates a
    # wedged tunnel/backend and is named as such in the watchdog line
    jnp.zeros(()).block_until_ready()
    _STATE["phase"] = "tokenizer_bench"

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

    pallas_max_err = None
    if on_tpu:
        # Compiled-kernel correctness gate: the fused megakernel's only
        # approximation is tanh-GELU (ops/pallas/lipvq_kernel.py:151-153);
        # assignments must agree exactly and recon within 5e-3. Run it on
        # rescaled weights (activations ~unit scale) — at default init the
        # activations are so small that tanh- and erf-GELU are bit-identical
        # in fp32 and the check would be trivially satisfied.
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        chk_rng = np.random.RandomState(11)
        chk_vars = jax.tree_util.tree_unflatten(
            treedef,
            [
                jnp.asarray(chk_rng.normal(0, 0.5, leaf.shape).astype(np.float32))
                for leaf in leaves
            ],
        )
        x_chk = jnp.asarray(
            np.random.RandomState(7).randn(4096, FEATURE_DIM).astype(np.float32)
        )
        def xla_reference(v, x):
            """Same math as the fused kernel (incl. tanh-GELU) in plain XLA,
            so any disagreement is Pallas codegen, not the documented
            GELU-flavor approximation."""
            p = v["params"]
            g = lambda t: jax.nn.gelu(t, approximate=True)  # noqa: E731
            h = g(x @ p["enc1"]["kernel"] + p["enc1"]["bias"])
            h = g(h @ p["enc2"]["kernel"] + p["enc2"]["bias"])
            W, ci = p["to_latent"]["W"], p["to_latent"]["ci"]
            absrowsum = jnp.sum(jnp.abs(W), axis=1, keepdims=True)
            scale = jnp.minimum(1.0, jax.nn.softplus(ci)[:, None] / absrowsum)
            z = jax.nn.sigmoid(h @ (W * scale).T + p["to_latent"]["b"])
            cb = p["quantizer"]["codebook"]
            dist = jnp.sum(cb * cb, -1)[None, :] - 2.0 * (z @ cb.T)
            idx = jnp.argmin(dist, -1)
            zq = cb[idx]
            d = g(zq @ p["dec1"]["kernel"] + p["dec1"]["bias"])
            d = g(d @ p["dec2"]["kernel"] + p["dec2"]["bias"])
            return d @ p["to_output"]["kernel"] + p["to_output"]["bias"], idx

        # ONE compiled program for fused + reference: the compile service
        # serializes our compiles with the flagship child's, so every
        # program saved here is budget handed to the child
        recon_f, idx_f, recon_x, idx_x = jax.jit(
            lambda v, x: (
                *model.apply(v, x, method=model.roundtrip_fused),
                *xla_reference(v, x),
            )
        )(chk_vars, x_chk)
        idx_mismatch = int(jnp.sum(idx_f != idx_x))
        agree = (idx_f == idx_x)[:, None]
        pallas_max_err = float(
            jnp.max(jnp.abs(jnp.where(agree, recon_f - recon_x, 0.0)))
        )
        assert idx_mismatch <= 4, (
            f"Pallas fused kernel disagrees with same-math XLA on "
            f"{idx_mismatch}/4096 codebook assignments (ulp-level Voronoi "
            f"ties would explain <=4)"
        )
        assert pallas_max_err < 5e-3, (
            f"Pallas fused recon max|err|={pallas_max_err:.2e} exceeds "
            f"tolerance 5e-3 on assignment-agreeing rows"
        )

    @jax.jit
    def chain(v, x, n):
        """n chained roundtrips ON DEVICE (lax.fori_loop): one dispatch, one
        scalar fetch - immune to per-call RPC jitter on tunneled backends.
        Feeding the reconstruction back as input serializes iterations.
        n is TRACED (dynamic trip count) so both chain lengths share one
        compiled program — compile time is budget shared with the child."""

        def body(_, y):
            recon, _ = model.apply(v, y, method=method)
            return recon

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, FEATURE_DIM).astype(np.float32)
    )

    _STATE["phase"] = "tokenizer_timing"
    # 101 iters keeps the measured window ~60ms (plenty vs the ~us-level
    # timer noise after differencing) without the compile+execute cost the
    # old 401-iteration chain paid out of the child's budget.
    n_short, n_long = (1, 5) if not on_tpu else (1, 101)
    # warmup (one compile serves both trip counts)
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
    result = {
        "metric": "lipvq_tokenize_detokenize_throughput",
        "value": round(chunks_per_sec, 1),
        "unit": "chunks/sec/chip",
        "vs_baseline": round(chunks_per_sec / baseline, 3),
    }
    if pallas_max_err is not None:
        result["pallas_recon_max_err"] = round(pallas_max_err, 6)
    _STATE["result"] = dict(result)  # visible to the deadline watchdog

    if child is not None:
        # leave ~10s of the budget for harvest + print
        _STATE["phase"] = "flagship_harvest"
        deadline = bench_start + budget - 10.0
        _harvest_flagship(child, out_f, err_f, result_path, deadline, result)
        # opportunistic serving-latency leg: only when the flagship landed
        # early enough that a get_action compile (~90-200 s) can fit in the
        # leftover budget; skipped silently otherwise (stretch metric — the
        # flagship number must never be jeopardized)
        if (
            "flagship_train_steps_per_sec" in result
            and deadline - time.perf_counter() > 120.0
        ):
            _STATE["phase"] = "infer_leg"
            _run_infer_leg(deadline, result)
    _emit(result)


def _run_infer_leg(deadline, result):
    infer_path = None
    try:
        fd, infer_path = tempfile.mkstemp(suffix=".infer.json")
        os.close(fd)
        os.unlink(infer_path)  # child creates it on success
        with open(os.devnull, "w") as devnull:
            child = subprocess.Popen(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_infer.py",
                )],
                env={**os.environ, "RMVQ_BF16": "1",
                     "RMVQ_INFER_BATCHES": "1",
                     "RMVQ_RESULT_FILE": infer_path},
                stdout=devnull, stderr=devnull, start_new_session=True,
            )
            while child.poll() is None:
                if time.perf_counter() >= deadline:
                    os.killpg(child.pid, signal.SIGKILL)
                    child.wait()
                    break
                time.sleep(2.0)
        if os.path.exists(infer_path):
            with open(infer_path) as f:
                infer = json.load(f)[0]  # batch 1
            result["flagship_get_action_ms"] = infer["value"]
            result["flagship_get_action_compile_sec"] = infer["compile_sec"]
    except Exception:
        pass  # best-effort: never disturb the primary fields
    finally:
        if infer_path:
            try:
                os.unlink(infer_path)
            except OSError:
                pass


if __name__ == "__main__":
    main()

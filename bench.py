"""Driver benchmark. Prints ONE JSON line.

Primary fields: the north-star metric — LipVQ-VAE action-chunk
tokenize+detokenize throughput on one chip (>= 10,000 chunks/sec/chip,
BASELINE.json "north_star"), gated on TPU by a compiled-Pallas numerics
assertion. Extra fields: flagship ICLTransformerHVQVAE bf16 train-step
throughput at the reference's shipped scale (the real workload — reference
hot loop ``robomimic/utils/train_utils.py:1238-1328``), serving latency
(get_action batch 1 + batch-16 throughput, reference batched rollouts
``robomimic/utils/train_utils.py:317-529``), and host-loader throughput.

WEDGE-PROOF ORCHESTRATION (this process NEVER imports jax):
the axon tunnel can hard-wedge such that any backend contact hangs
forever (observed rounds 3-4: ``jax.devices()`` blocks >= 240 s). So all
backend contact happens in DISPOSABLE SUBPROCESSES with per-attempt
timeouts — a wedged backend is per-process state, and a fresh process per
attempt is the only possible recovery:

  t=0   spawn the flagship child (its 150-500 s XLA compile overlaps
        everything below; self-gates rc=3 on CPU)
  t=0   liveness probe, 2 attempts (60 s + 15 s, fresh process each).
        BOTH fail -> kill children, print ``backend_unreachable: true``
        and exit in < 90 s instead of burning the whole budget.
  then  tokenizer leg (bench_tokenizer.py, own timeout, retried once on
        a crash), flagship harvest at the deadline, and opportunistic
        infer + loader legs with leftover budget.

MEASURED CONSTRAINT (round 4): at most TWO children may touch the
tunnel's remote-compile helper at once. A t=0 infer child (three
concurrent cold compiles) was tried and starved the tokenizer leg past
its 300 s cap AND pushed the flagship past the deadline — and children
killed mid-compile never write their persistent-cache entry, so the
failure repeats. The infer leg therefore stays opportunistic (spawned
only after the flagship result lands); on a warm cache every leg fits
the default budget with minutes to spare.

Every completed leg's fields are merged into the accumulated result dict
IMMEDIATELY (legs also write their own result files incrementally), and a
watchdog thread prints the accumulated result at the deadline no matter
what — a late wedge can never erase an early success.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_STATE = {"result": {}, "printed": False, "live_procs": []}


def _kill_live_procs():
    """SIGKILL every still-running backend-touching subprocess (by process
    group). The watchdog calls this before os._exit: children are started
    with start_new_session=True, so a bare parent exit would ORPHAN them —
    a wedged probe/compile child would keep holding the tunnel and corrupt
    the next bench/harvest run."""
    for proc in _STATE["live_procs"]:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass


def _emit(result=None):
    if not _STATE["printed"]:
        _STATE["printed"] = True
        out = dict(_STATE["result"] if result is None else result)
        out.setdefault("metric", "lipvq_tokenize_detokenize_throughput")
        out.setdefault("value", None)
        out.setdefault("unit", "chunks/sec/chip")
        out.setdefault("vs_baseline", None)
        print(json.dumps(out), flush=True)


def _merge(fields):
    """Incremental accumulation: visible to the deadline watchdog the
    moment a leg lands, so nothing completed is ever lost."""
    _STATE["result"].update(fields)


def _watchdog(deadline):
    """Guarantee ONE JSON line before the driver's timeout. The parent is
    structurally hang-proof (it never touches the backend), so this is
    belt-and-suspenders for e.g. a pathological filesystem stall."""
    import threading

    def run():
        while time.perf_counter() < deadline:
            if _STATE["printed"]:
                return
            time.sleep(1.0)
        if not _STATE["printed"]:
            _STATE["result"]["watchdog"] = (
                "orchestrator hit the budget deadline; accumulated partial "
                "results follow"
            )
            _emit()
            _kill_live_procs()
            os._exit(0)

    threading.Thread(target=run, daemon=True).start()


class _Child:
    """A disposable backend-touching subprocess. stdout/stderr go to FILES
    and the child gets its own process group: backend helper processes
    inherit pipes and would make a post-kill pipe read hang forever;
    killpg reaps them too."""

    def __init__(self, script, extra_env, tag):
        self.out_f = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".{tag}.out", delete=False
        )
        self.err_f = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".{tag}.err", delete=False
        )
        self.result_path = self.out_f.name + ".json"
        env = {**os.environ, "RMVQ_RESULT_FILE": self.result_path,
               **extra_env}
        # repo root on PYTHONPATH + as cwd: legs import the package no
        # matter where the driver invoked bench.py from
        env["PYTHONPATH"] = _HERE + os.pathsep + env.get("PYTHONPATH", "")
        self.proc = subprocess.Popen(
            [sys.executable, os.path.join(_HERE, script)],
            env=env, cwd=_HERE, stdout=self.out_f, stderr=self.err_f,
            start_new_session=True,
        )
        _STATE["live_procs"].append(self.proc)

    def poll(self):
        return self.proc.poll()

    def read_result(self):
        """Parse the child's incrementally-written result file (None if it
        hasn't produced one yet)."""
        try:
            if os.path.exists(self.result_path):
                with open(self.result_path) as f:
                    return json.load(f)
        except (OSError, ValueError):
            pass
        return None

    def kill(self):
        if self.proc.poll() is None:
            try:  # TERM first: SIGKILLed probes are suspected of leaving
                os.killpg(self.proc.pid, signal.SIGTERM)  # tunnel claims stuck
                for _ in range(20):
                    if self.proc.poll() is not None:
                        break
                    time.sleep(0.1)
            except OSError:
                pass
            if self.proc.poll() is None:
                try:
                    os.killpg(self.proc.pid, signal.SIGKILL)
                except OSError:
                    pass
            try:
                self.proc.wait(timeout=5)
            except Exception:
                pass

    def stderr_tail(self, n=200):
        try:
            self.err_f.seek(0)
            return self.err_f.read().strip()[-n:]
        except Exception:
            return ""

    def cleanup(self, keep=False):
        for f in (self.out_f, self.err_f):
            try:
                f.close()
            except Exception:
                pass
        if not keep:
            for p in (self.out_f.name, self.err_f.name, self.result_path):
                try:
                    os.unlink(p)
                except OSError:
                    pass


_PROBE_SRC = (
    # the package __init__ honors RMVQ_FORCE_CPU (the axon plugin ignores
    # JAX_PLATFORMS), so the probe sees the same backend the legs will use
    "import robot_manipulation_vq_vae_tpu;"
    "import jax, jax.numpy as jnp, json, os;"
    "jnp.zeros(()).block_until_ready();"
    "open(os.environ['RMVQ_RESULT_FILE'],'w').write("
    "json.dumps({'backend': jax.default_backend()}))"
)


def _probe(timeout_sec):
    """One liveness attempt in a fresh process: first device contact plus
    backend name. Returns the backend string, or None on hang/crash."""
    out_f = tempfile.NamedTemporaryFile(mode="w+", suffix=".probe.out",
                                        delete=False)
    result_path = out_f.name + ".json"
    env = {**os.environ, "RMVQ_RESULT_FILE": result_path}
    env["PYTHONPATH"] = _HERE + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE_SRC],
        env=env, cwd=_HERE, stdout=out_f, stderr=out_f,
        start_new_session=True,
    )
    _STATE["live_procs"].append(proc)
    backend = None
    t0 = time.perf_counter()
    while proc.poll() is None:
        if time.perf_counter() - t0 > timeout_sec:
            break
        time.sleep(0.5)
    if proc.poll() is None:  # hung: wedged backend
        try:
            os.killpg(proc.pid, signal.SIGTERM)
            time.sleep(1.0)
            if proc.poll() is None:
                os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            proc.wait(timeout=5)
        except Exception:
            pass
    elif proc.returncode == 0 and os.path.exists(result_path):
        try:
            with open(result_path) as f:
                backend = json.load(f).get("backend")
        except (OSError, ValueError):
            pass
    for p in (out_f.name, result_path):
        try:
            out_f.close()
            os.unlink(p)
        except OSError:
            pass
    return backend


def _wait_leg(child, timeout_abs):
    """Poll a child until exit or the absolute deadline; returns rc or
    None if it had to be killed at the deadline."""
    while child.poll() is None:
        if time.perf_counter() >= timeout_abs:
            child.kill()
            return None
        time.sleep(1.0)
    return child.proc.returncode


def _run_tokenizer_leg(deadline):
    """North-star leg with a bounded retry: a crash (rc!=0) gets ONE fresh
    process if budget allows; a hang does not (per-attempt timeout)."""
    for attempt in (1, 2):
        left = deadline - time.perf_counter()
        if left < 45.0:
            return
        child = _Child("bench_tokenizer.py", {}, "tok")
        rc = _wait_leg(child, time.perf_counter() + min(300.0, left))
        res = child.read_result()
        if res:  # incremental file: present even on a late kill
            _merge(res)
        if rc == 0 and res and res.get("value") is not None:
            child.cleanup()
            return
        if rc is None:  # hang -> assume wedge-class failure, don't retry
            _merge({"tokenizer_error": "leg hit its per-attempt timeout"})
            child.cleanup(keep=True)
            return
        _merge({"tokenizer_error":
                f"rc={rc} attempt={attempt}: {child.stderr_tail()}"})
        child.cleanup(keep=True)


_FLAGSHIP_KEYS = {
    "value": "flagship_train_steps_per_sec",
    "samples_per_sec": "flagship_samples_per_sec",
    "compile_sec": "flagship_compile_sec",
    "mixed_precision": "flagship_mixed_precision",
    "tflops_per_sec": "flagship_tflops_per_sec",
}


def _harvest_flagship(child, deadline):
    """Wait for the flagship child until `deadline`; merge its result file.
    Returns True if the flagship numbers landed."""
    rc = _wait_leg(child, deadline)
    res = child.read_result()
    if rc == 3:
        child.cleanup()
        return False  # CPU backend: deliberately skipped
    if res and "value" in res:
        _merge({out: res[k] for k, out in _FLAGSHIP_KEYS.items() if k in res})
        child.cleanup()
        return True
    if rc is None:
        _merge({"flagship_error":
                "flagship child hit the bench deadline "
                "(XLA compile variance over the tunnel)"})
    else:
        _merge({"flagship_error": f"rc={rc}: {child.stderr_tail()}"})
    child.cleanup(keep=True)
    return False


def _run_infer_leg(deadline):
    """Serving leg: get_action latency at batch 1 and batch-16 throughput
    (+ dp-sharded batch-16 and the fake-env rollout pipeline when budget
    allows). Spawned only AFTER the flagship result lands (see the
    module-docstring compile-helper constraint). bench_infer.py flushes its
    result file after EACH measurement, so a deadline kill still captures
    whatever landed."""
    child = _Child("bench_infer.py",
                   {"RMVQ_BF16": "1", "RMVQ_INFER_BATCHES": "1,16",
                    "RMVQ_ROLLOUT_FPS": "1",
                    "RMVQ_REQUIRE_TPU": "1"}, "infer")
    rc = _wait_leg(child, deadline)
    res = child.read_result()  # list of per-measurement dicts
    got_value = False
    if res:
        for entry in res:
            if entry.get("metric") == "rollout_fps":
                _merge({"rollout_actions_per_sec": entry["actions_per_sec"],
                        "rollout_n_envs": entry["n_envs"]})
                got_value = True
            elif entry.get("sharded"):
                _merge({"sharded_batch16_actions_per_sec":
                        entry["actions_per_sec"],
                        "sharded_n_devices": entry["n_devices"]})
                got_value = True
            elif entry.get("batch") == 1:
                _merge({
                    "flagship_get_action_ms": entry["value"],
                    "flagship_get_action_compile_sec": entry["compile_sec"],
                })
                got_value = True
            elif entry.get("batch") == 16:
                _merge({"batch16_actions_per_sec": entry["actions_per_sec"]})
                got_value = True
    # distinguish "attempted but failed/killed" from "never attempted":
    # rc None = deadline kill, rc 3 = self-gated skip on CPU
    if rc == 3:
        _merge({"infer_skipped": "cpu backend"})
    elif not got_value:
        if rc is None:
            _merge({"infer_error": "leg killed at its deadline"})
        elif rc != 0:
            _merge({"infer_error": f"rc={rc}: {child.stderr_tail()}"})
    child.cleanup()


def _tunnel_diag(host="127.0.0.1", port=2024, wait_sec=5.0):
    """Cheap wedge evidence for the result JSON: the axon relay listens on
    127.0.0.1:2024. A healthy tunnel answers device-contact RPCs; the
    observed wedge mode (rounds 3-4) is TCP accept + dead upstream, i.e.
    connect succeeds but nothing ever comes back. Distinguishing that from
    'nothing listening' pins the hang on infrastructure, not this code."""
    import socket

    try:
        with socket.create_connection((host, port), timeout=3.0) as s:
            s.settimeout(wait_sec)
            try:
                data = s.recv(64)
            except socket.timeout:
                return (f"relay {host}:{port} accepts TCP but sent no "
                        f"bytes in {wait_sec:.0f}s (dead upstream)")
            if data:
                return f"relay {host}:{port} connected, sent {len(data)}B"
            return f"relay {host}:{port} connected, closed immediately"
    except OSError as e:
        return f"relay {host}:{port} unreachable: {e}"


def _run_loader_leg(deadline):
    """Host data-path leg (CPU-only: RMVQ_FORCE_CPU keeps it off the
    tunnel). Reports the cached-path loader throughput medianised by
    bench_loader itself."""
    child = _Child(
        os.path.join("robot_manipulation_vq_vae_tpu", "scripts",
                     "bench_loader.py"),
        {"RMVQ_FORCE_CPU": "1", "RMVQ_LOADER_QUICK": "1"}, "loader")
    _wait_leg(child, deadline)
    res = child.read_result()
    if res:
        best = max((e for e in res if "value" in e),
                   key=lambda e: e["value"], default=None)
        if best:
            _merge({"loader_samples_per_sec": best["value"],
                    "loader_gbytes_per_sec": best.get("gbytes_per_sec")})
    child.cleanup()


def main():
    start = time.perf_counter()
    budget = float(os.environ.get("RMVQ_BENCH_BUDGET_SEC", "560"))
    deadline = start + budget
    _watchdog(deadline - 5.0)

    # flagship child at t=0 — its long compile overlaps everything below
    flagship = None
    if os.environ.get("RMVQ_BENCH_FLAGSHIP", "1") == "1":
        flagship = _Child(
            "bench_train.py",
            {"RMVQ_REQUIRE_TPU": "1", "RMVQ_BF16": "1", "RMVQ_BATCH": "64"},
            "flagship",
        )

    # liveness probe: 2 disposable attempts, then give up FAST
    backend = _probe(float(os.environ.get("RMVQ_BENCH_PROBE_SEC", "60")))
    if backend is None:
        backend = _probe(15.0)
        if backend is None:
            if flagship is not None:
                flagship.kill()
                flagship.cleanup(keep=True)
            _merge({
                "backend_unreachable": True,
                "tunnel_diag": _tunnel_diag(),
                "probe_attempts": 2,
                "note": (
                    "first device contact hung in 2 fresh subprocesses "
                    "(60s + 15s): the TPU tunnel/backend is wedged — "
                    "exiting early instead of burning the budget"
                ),
            })
            # the host data path never touches the tunnel (RMVQ_FORCE_CPU
            # short-circuits the axon plugin in the package __init__), so
            # a wedge still yields one REAL measured number instead of a
            # bare unreachable line. Bounded so total wedge-mode runtime
            # stays well under the driver budget.
            _run_loader_leg(
                min(deadline, time.perf_counter() + 240.0) - 8.0
            )
            _emit()
            return
    _merge({"backend": backend})

    _run_tokenizer_leg(deadline - 15.0)

    landed = False
    if flagship is not None:
        landed = _harvest_flagship(flagship, deadline - 10.0)
    # host data-path leg FIRST among the leftovers: RMVQ_FORCE_CPU keeps it
    # off the tunnel entirely, its cost is bounded (~2 min) and predictable,
    # and it must never again be starved by a cold infer compile (it missed
    # BENCH_r04 exactly that way). Runs even if the flagship leg failed —
    # by this point every backend-touching child has exited or been killed.
    if deadline - time.perf_counter() > 45.0:
        _run_loader_leg(min(deadline - 8.0, time.perf_counter() + 240.0))
    # opportunistic serving leg with whatever budget remains; the flagship
    # number is never jeopardized (it already landed). Cold-cache runs
    # can't fit the infer compile here — by design: see the
    # module-docstring compile-helper constraint; on a warm cache this
    # lands in well under a minute.
    if landed and deadline - time.perf_counter() > 60.0:
        _run_infer_leg(deadline - 10.0)
    _emit()


if __name__ == "__main__":
    main()

"""Compile-once hygiene: after several same-shape train/validate steps,
every algo's jitted train step must have exactly the expected number of
compiled entries (one per static validate flag it saw) — a retrace per
step would multiply wall-clock by the 150-500s flagship compile cost on
the real chip. Guards against accidentally passing fresh Python objects
(configs, hooks, temperatures) as static arguments.

Reuses the per-algo tiny-config table from test_validate_invariance.
"""

import pytest

from test_validate_invariance import CASES, _make, _states, make_raw_batch


@pytest.mark.slow
@pytest.mark.parametrize("case", sorted(CASES))
def test_no_retrace_across_steps(case):
    algo = _make(case)
    for seed in range(3):
        algo.train_on_batch(
            algo.process_batch_for_training(make_raw_batch(seed, case)),
            epoch=1, validate=False,
        )
    algo.train_on_batch(
        algo.process_batch_for_training(make_raw_batch(9, case)),
        epoch=1, validate=True,
    )
    checked = 0
    for sub in _states(algo):
        fn = getattr(sub, "_train_step_jit", None)
        if fn is None or not hasattr(fn, "_cache_size"):
            continue
        checked += 1
        # one trace per static validate flag (False from training, True
        # from the validate call)
        n = fn._cache_size()
        assert n <= 2, (
            f"{case}: jitted train step retraced — {n} compiled entries "
            f"after same-shape steps (expected <= 2: train + validate)"
        )
    assert checked > 0, (
        f"{case}: no jitted step exposed _cache_size — the retrace guard "
        "would be vacuous (JAX private API changed?)"
    )

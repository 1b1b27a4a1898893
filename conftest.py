"""Root conftest: force the test suite onto a local 8-device virtual CPU mesh.

The container's sitecustomize registers a remote-compile TPU backend
(``axon``) at interpreter startup; every XLA compile there takes a ~45 s
network round-trip, which is unusable for a test suite full of small jits.
``jax.config.update`` still works post-import, so we flip the platform to
local CPU with 8 virtual devices (for sharding tests) before any test runs.
Set ``RMVQ_TESTS_ON_TPU=1`` to run the tests against the real TPU backend.
"""

import os

if os.environ.get("RMVQ_TESTS_ON_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the suite is compile-bound on CPU
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/rmvq_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", 8)

"""Test configuration (see repo-root conftest.py for the backend switch).

This duplicate exists so running pytest from inside ``tests/`` directly also
lands on the local CPU backend with 8 virtual devices.
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
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # already initialized by root conftest

"""Early pytest plugin: re-exec the suite on the CPU backend.

Loaded via ``pytest.ini`` ``addopts = -p _tpuvae_pytest_cpu`` — plugin import
happens during option preparse, *before* pytest's fd capture starts, so the
re-exec'd process keeps the original stdout/stderr.

Why re-exec at all: the container's sitecustomize eagerly registers the TPU
PJRT plugin at interpreter start and that wins over ``JAX_PLATFORMS``; the
only way to get a CPU-backed 8-virtual-device JAX (the mesh-test harness,
SURVEY.md §4) is a fresh interpreter with PYTHONPATH scrubbed.  Set
``TPUVAE_TEST_TPU=1`` to run the suite on the real TPU instead.
"""

import os
import sys

if os.environ.get("TPUVAE_TEST_TPU") == "1":
    # real-TPU suite run: every fresh graph costs ~2 min of remote compile;
    # the persistent cache makes reruns (and post-crash resumes) cheap
    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()

if os.environ.get("TPUVAE_TEST_REEXEC") == "1":
    # CPU suite: XLA:CPU compiles dominate the single-core wall-clock;
    # cache them so reruns (local dev, CI retries) skip recompilation.
    # A separate dir from the TPU cache keeps eviction behavior predictable.
    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.expanduser("~"), ".cache", "tpuvae-xla-cputest"))

if (
    os.environ.get("TPUVAE_TEST_TPU") != "1"
    and os.environ.get("TPUVAE_TEST_REEXEC") != "1"
):
    env = dict(os.environ)
    env["TPUVAE_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # drop the TPU plugin sitecustomize
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

"""apply_platform_env: platform forcing + persistent-compile-cache wiring.

The cache is the r4 remote-compile fix (second process 0.72s -> 0.09s,
benchmarks/compile_cache_probe.py); these tests pin the env contract in
subprocesses so the suite's own jax config stays untouched.
"""

import os
import subprocess
import sys

SNIPPET = """
import jax
from qkan_implementation_tpu.utils.platform import apply_platform_env
apply_platform_env()
print("CACHE_DIR=", jax.config.jax_compilation_cache_dir, sep="")
print("MIN_SECS=", jax.config.jax_persistent_cache_min_compile_time_secs, sep="")
"""


def run(env_extra):
    env = dict(os.environ, QKAN_PLATFORM="cpu", **env_extra)
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-800:]
    return dict(
        line.split("=", 1) for line in out.stdout.splitlines() if "=" in line
    )


def test_cache_enabled_by_default(tmp_path):
    got = run({"QKAN_COMPILE_CACHE": str(tmp_path / "cache")})
    assert got["CACHE_DIR"] == str(tmp_path / "cache")
    assert float(got["MIN_SECS"]) == 0.0


def test_cache_opt_out():
    got = run({"QKAN_COMPILE_CACHE": "0"})
    assert got["CACHE_DIR"] == "None"


def test_cache_default_location():
    # QKAN_PLATFORM=tpu only updates jax.config (lazy -- no device init),
    # so the subprocess exits cleanly without touching the tunnel
    env = dict(os.environ, QKAN_PLATFORM="tpu")
    env.pop("QKAN_COMPILE_CACHE", None)
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert ".cache/qkan_jax_compile" in out.stdout


def test_cache_default_off_when_resolved_cpu():
    """No QKAN_PLATFORM, but jax_platforms already forced to cpu via
    jax.config (the test harness / a caller did it): the default cache
    must stay unwired -- gating on the env var alone would write CPU AOT
    entries to the shared TPU dir (ADVICE r4)."""
    snippet = """
import jax
jax.config.update("jax_platforms", "cpu")
from qkan_implementation_tpu.utils.platform import apply_platform_env
apply_platform_env()
print("CACHE_DIR=", jax.config.jax_compilation_cache_dir, sep="")
"""
    env = dict(os.environ)
    env.pop("QKAN_COMPILE_CACHE", None)
    env.pop("QKAN_PLATFORM", None)
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "CACHE_DIR=None" in out.stdout


def test_disable_default_compile_cache():
    """bench.py's TPU-unhealthy fallback unwires the defaulted dir before
    forcing cpu; an explicit QKAN_COMPILE_CACHE choice is left alone."""
    snippet = """
import jax
from qkan_implementation_tpu.utils.platform import (
    apply_platform_env, disable_default_compile_cache,
)
apply_platform_env()
disable_default_compile_cache()
print("CACHE_DIR=", jax.config.jax_compilation_cache_dir, sep="")
"""
    env = dict(os.environ, QKAN_PLATFORM="tpu")
    env.pop("QKAN_COMPILE_CACHE", None)
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "CACHE_DIR=None" in out.stdout
    # an EXPLICIT dir survives disable_default_compile_cache
    env2 = dict(
        os.environ,
        QKAN_PLATFORM="cpu",
        QKAN_COMPILE_CACHE="/tmp/qkan_explicit_cache_test",
    )
    out2 = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True,
        env=env2, timeout=120,
    )
    assert out2.returncode == 0, out2.stderr[-800:]
    assert "CACHE_DIR=/tmp/qkan_explicit_cache_test" in out2.stdout


def test_cache_default_off_on_cpu():
    """Forced-cpu runs must NOT default into the shared cache dir: CPU
    compiles are subsecond and XLA:CPU AOT entries are machine-feature
    keyed (mismatched entries from other hosts load with SIGILL-warning
    banners).  An explicit dir still wins (test_cache_enabled_by_default)."""
    env = dict(os.environ, QKAN_PLATFORM="cpu")
    env.pop("QKAN_COMPILE_CACHE", None)
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "CACHE_DIR=None" in out.stdout

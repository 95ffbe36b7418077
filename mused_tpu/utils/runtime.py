"""Runtime setup helpers shared by the CLI, bench, and driver entry points."""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short fingerprint of the host's CPU feature set.

    The persistent cache stores AOT-compiled CPU executables; loading an
    entry compiled on a host with a different feature set (these sessions
    migrate across heterogeneous VMs — observed: an AMX/avx512 host's
    entries loaded on a narrower one) makes XLA warn "could lead to
    execution errors such as SIGILL".  Keying the cache directory by the
    feature set makes cross-host reuse structurally impossible; TPU
    executables are target-keyed by XLA itself, so per-host TPU subdirs
    only cost one warm-up per new host.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    # jax version + XLA_FLAGS join the key: entries also embed XLA target
    # OPTIONS (e.g. prefer-no-gather) that /proc/cpuinfo cannot see —
    # observed a "could lead to SIGILL" loader warning from an entry
    # AOT-compiled under a different option set on the same CPU
    import jax
    key = (f"{platform.machine()}|{flags}|{jax.__version__}"
           f"|{os.environ.get('XLA_FLAGS', '')}")
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compiles over the remote TPU
    tunnel take minutes; the cache makes every later process start warm.

    The cache directory is keyed by the host's CPU feature fingerprint
    (see _host_fingerprint): stale entries from a differently-featured VM
    would otherwise be loaded as native code on this one.

    ``MUSED_TPU_NO_COMPILE_CACHE=1`` disables it entirely.  The test suite
    sets it (tests/conftest.py): at whole-suite scale on the CPU backend,
    XLA's ``executable.serialize()`` segfaults after hundreds of
    compilations (jax 0.9.0, any codec) — and the CLI under test calls this
    helper, which would otherwise switch the cache on mid-suite."""
    import jax
    if os.environ.get("MUSED_TPU_NO_COMPILE_CACHE"):
        return
    path = path or os.environ.get(
        "MUSED_TPU_CACHE", os.path.expanduser("~/.cache/mused_tpu_jax"))
    path = os.path.join(path, _host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:     # cache is an optimization, never a requirement
        pass

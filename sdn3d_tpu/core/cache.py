"""Persistent XLA compilation cache, on for every sdn3d_tpu entry point.

The benchmark TPU sits behind a relay whose jit compiles are both slow and
high-variance (the SAME fused semantic program was observed compiling in
219 s / 1153 s / 159 s across processes, NOTES_ROUND3.md) — any CLI run
without the persistent cache replays that lottery.  The reference has no
counterpart (PyTorch kernels ship precompiled); for an XLA framework the
cache IS the precompiled-kernel story, so it belongs in the package, not
in one benchmark script.

`enable_compilation_cache()` is idempotent and called from
`sdn3d_tpu/__init__.py`, covering all 13 CLIs, bench.py, the driver entry
points and the test suite.  Opt out with SDN3D_NO_COMPILATION_CACHE=1;
redirect with JAX_COMPILATION_CACHE_DIR or SDN3D_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/sdn3d_jax_cache"


def _host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU feature set.

    XLA:CPU AOT executables record the compile machine's features and
    warn 'could lead to execution errors such as SIGILL' when a host
    with a different feature set loads them (observed when /tmp cache
    dirs outlive a session and the next run lands on different
    hardware).  Partitioning by feature-set hash makes cross-host
    loads structurally impossible."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(subdir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Returns the cache dir in effect, or None when disabled.  Safe to call
    before or after backends initialize (the config flag is read at
    compile time, not backend-init time).

    `subdir` partitions the cache (e.g. "cpu" for forced-CPU runs):
    TPU-relay processes also write host-side CPU executables whose
    recorded machine features can differ from a plain CPU process's —
    XLA then warns 'could lead to SIGILL' when the other kind of process
    loads them.  Forced-CPU entry points (tests, dryrun_multichip) use
    their own partition so the two populations never cross-load."""
    if os.environ.get("SDN3D_NO_COMPILATION_CACHE"):
        return None
    cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.environ.get("SDN3D_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    if subdir:
        if subdir == "cpu":
            # forced-CPU executables are host-feature-specific (AOT);
            # see _host_fingerprint
            subdir = "cpu-" + _host_fingerprint()
        cache_dir = os.path.join(cache_dir, subdir)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    # keep subprocesses (CLI stages spawned by scripts, PrefetchLoader
    # workers) on the same cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist even sub-second compiles: serving retraces tiny
        # per-shape programs (e.g. the per-n crop pad), and on the relay
        # even a trivial compile costs a round trip — jax's default 1 s
        # threshold would replay them in every process forever
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        # leave the env var as the fallback; jax reads it at config init
        pass
    return cache_dir

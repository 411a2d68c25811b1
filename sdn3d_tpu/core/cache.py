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
    """Fingerprint of this host's CPU identity AND the XLA that compiles
    for it.

    XLA:CPU AOT executables record the compile machine's *target
    features* and warn 'could lead to execution errors such as SIGILL'
    when a loading process's features differ.  Those recorded features
    are not just /proc/cpuinfo flags: XLA also bakes in tuning
    pseudo-features (e.g. '+prefer-no-gather') chosen per CPU *model*
    and per XLA *version* — MULTICHIP_r04.json caught exactly such a
    warning surviving a flags-only partition after a jaxlib bump.  So
    the key is (arch, cpu model name, cpu flags, jaxlib version): any
    of those changing moves the partition.

    Scope of the claim (measured r5, controlled experiment): the
    partition protects against loading executables compiled for a
    DIFFERENT machine/XLA.  It cannot silence the loader's warning
    itself — jaxlib 0.9's cpu_aot_loader compares the compile-time
    feature string (which includes the tuning pseudo-features) against
    raw host CPU detection (which never includes them), so EVERY
    persistent-cache CPU AOT load warns about +prefer-no-gather/-scatter
    even when the same process on the same host wrote the entry seconds
    earlier, and the loaded executable is bit-identical to a fresh
    compile (pinned: test_cpu_aot_cache_load_is_benign)."""
    import hashlib
    import platform

    feats = [platform.machine()]
    try:
        import jaxlib

        feats.append(getattr(jaxlib, "__version__", "unknown"))
    except Exception:
        feats.append("no-jaxlib")
    try:
        with open("/proc/cpuinfo") as f:
            got = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags", "Features") \
                        and key not in got:
                    got.add(key)
                    feats.append(
                        " ".join(sorted(line.split(":", 1)[1].split())))
                if len(got) == 2:
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(feats).encode()).hexdigest()[:12]


def enable_compilation_cache(subdir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Returns the cache dir in effect, or None when disabled.  Safe to call
    before or after backends initialize (the config flag is read at
    compile time, not backend-init time).

    EVERY partition embeds `_host_fingerprint()`: TPU-relay processes
    also write host-side CPU AOT executables, and a round-5 verify
    drive caught a forced-CPU process loading a stale default-partition
    entry with mismatched tuning features (+prefer-no-gather) — so the
    default partition is fingerprinted too, not just the "cpu" one.
    `subdir="cpu"` keeps forced-CPU entry points (tests,
    dryrun_multichip) in their own population: their executables can
    record different features than a TPU-relay process's host-side
    programs on the SAME machine.  A fingerprint partition inherited
    from a parent process (env var) is re-derived, so children always
    land in the partition matching their own host + jaxlib."""
    if os.environ.get("SDN3D_NO_COMPILATION_CACHE"):
        return None
    base = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.environ.get("SDN3D_CACHE_DIR")
            or DEFAULT_CACHE_DIR)
    bn = os.path.basename(base)
    if bn.startswith(("hw-", "cpu-")):   # parent already partitioned
        base = os.path.dirname(base)
    prefix = "cpu" if subdir == "cpu" else (subdir or "hw")
    cache_dir = os.path.join(base, prefix + "-" + _host_fingerprint())
    # propagate to subprocesses (CLI stages spawned by scripts,
    # PrefetchLoader workers) — they re-derive via the strip above
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
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

"""Machine-feature-keyed persistent cache paths.

XLA:CPU's persistent compile cache stores AOT executables specialized to the
compiling host's CPU feature set; loading them on a different machine emits
``cpu_aot_loader`` feature-mismatch errors and "could lead to SIGILL"
warnings, and a silently-tolerated mismatch can corrupt both timing and
results.  Every on-disk cache this framework keeps (the test compile cache in
tests/conftest.py, the fixture-tower cache in training/zoo.py) therefore
lives under a directory keyed by a hash of the host CPU's feature flags plus
the jax version — a migrated sandbox simply starts a fresh cache instead of
loading another machine's code.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_key() -> str:
    """Short stable hash of (CPU feature flags, jax version, python minor)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor() or platform.machine()
    try:
        import jax

        ver = jax.__version__
    except Exception:  # pragma: no cover - jax is always present in-tree
        ver = "nojax"
    py = ".".join(platform.python_version_tuple()[:2])
    h = hashlib.sha1(f"{feats}|{ver}|{py}".encode()).hexdigest()[:12]
    return h


def machine_cache_dir(name: str, root: str = "/tmp/holoagent_tpu") -> str:
    """Per-machine cache directory ``<root>/<name>-<machine_key>``."""
    path = os.path.join(root, f"{name}-{machine_key()}")
    os.makedirs(path, exist_ok=True)
    return path

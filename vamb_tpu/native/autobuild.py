"""Best-effort on-demand build of the native host-side libraries.

A fresh checkout has only the C++ sources; the shared objects are built by
`native/build.sh`. Loaders call `ensure_built()` before giving up when a
`.so` is missing, so tests and the CLI work out of the box on any machine
with a C++ toolchain. The build is attempted at most once per process and
never raises — callers keep their own fallback/error paths.
"""

import os
import subprocess

_ATTEMPTED = False


def ensure_built() -> None:
    """Run native/build.sh once if any shared library is missing."""
    global _ATTEMPTED
    if _ATTEMPTED:
        return
    _ATTEMPTED = True
    here = os.path.dirname(os.path.abspath(__file__))
    libs = [os.path.join(here, n) for n in ("libvambops.so", "libbamcov.so")]
    if all(os.path.exists(p) for p in libs):
        return
    script = os.path.join(here, "build.sh")
    if not os.path.exists(script):
        return
    try:
        subprocess.run(
            ["sh", script],
            check=False,
            timeout=120,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except (OSError, subprocess.TimeoutExpired):
        pass

"""Host-memory hygiene for long runs.

Round-3/4 leak forensics (reports/host_leak_r3.json, host_leak_r4.json):
the tunneled TPU runtime's h2d path retains payloads (fixed by the
device-resident dataset cache), and the remaining steady host-RSS growth
is dominated by glibc arena fragmentation from per-step d2h traffic —
`malloc_trim(0)` returns it to the kernel (probe `d2h_fresh_buffer`:
+67 MB over 40 fetches raw, fully reclaimed after trim). The reference's
Lightning trainer never faces this because torch pins and reuses host
buffers; here we trim at validation boundaries instead (a few ms each).
"""

from __future__ import annotations

import ctypes
import gc

_libc = None
_unavailable = False


def trim_host_memory(collect: bool = True) -> bool:
    """gc + glibc malloc_trim(0). Returns True if trim actually ran.

    Safe everywhere: on non-glibc platforms it degrades to plain gc.
    """
    global _libc, _unavailable
    if collect:
        gc.collect()
    if _unavailable:
        return False
    if _libc is None:
        try:
            _libc = ctypes.CDLL("libc.so.6")
            _libc.malloc_trim.restype = ctypes.c_int
        except Exception:
            _unavailable = True
            return False
    try:
        _libc.malloc_trim(0)
        return True
    except Exception:
        _unavailable = True
        return False

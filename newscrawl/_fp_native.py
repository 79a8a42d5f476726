"""Optional native (C/ctypes) kernel for rolling_fingerprint.

The Rabin-Karp min-window fingerprint is the extract kernel's single
largest cost (~610 us/page pure-Python — an inherently sequential
per-byte recurrence that numpy cannot vectorize profitably; measured:
every numpy formulation was slower or marginal). A 40-line C loop is
~40x faster. This module compiles it ON DEMAND with the system C
compiler into a content-addressed cached .so; if anything fails —
no compiler, sandboxed tmp, exotic platform — callers silently fall
back to the pure-Python spec (extract.rolling_fingerprint), which
remains the single source of truth:

- the reference oracle always uses the Python spec, so the golden
  article diffs cross-validate native vs Python on every crawl test;
- an explicit property test compares them on adversarial inputs.

Executor-safety: each Python worker process resolves the library
itself on first use (compile once per machine, atomic rename into the
cache path; concurrent compilers race benignly).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

# Exact C translation of extract.rolling_fingerprint's arithmetic:
# h' = ((h - data[i-w]*top) * B + data[i]) mod M, M = 2^61-1 (Mersenne:
# x mod M folds as (x & M) + (x >> 61)), all intermediates in uint128.
_SRC = r"""
#include <stdint.h>

#define FP_M  ((((uint64_t)1) << 61) - 1)

static inline uint64_t fold(__uint128_t x) {
    /* x < 2^122 -> canonical residue mod M */
    x = (x & FP_M) + (x >> 61);          /* < 2^62 */
    x = (x & FP_M) + (x >> 61);          /* < M + 2 */
    return (uint64_t)(x >= FP_M ? x - FP_M : x);
}

uint64_t fp_min(const unsigned char *data, int64_t n,
                int64_t w, uint64_t B, uint64_t top) {
    if (n <= 0) return 0;
    if (w > n) w = n;
    __uint128_t h = 0;
    for (int64_t i = 0; i < w; i++)
        h = fold(h * B + data[i]);
    uint64_t best = (uint64_t)h;
    for (int64_t i = w; i < n; i++) {
        /* h - data[i-w]*top (mod M), kept non-negative */
        __uint128_t t = fold((__uint128_t)data[i - w] * top);
        __uint128_t d = (uint64_t)h + (FP_M - (uint64_t)t); /* < 2^62 */
        h = fold(d * B + data[i]);
        if ((uint64_t)h < best) best = (uint64_t)h;
    }
    return best;
}
"""

_lib: "ctypes.CDLL | bool | None" = None


def _load() -> "ctypes.CDLL | bool":
    global _lib
    if _lib is not None:
        return _lib
    try:
        tag = hashlib.md5(_SRC.encode("utf-8")).hexdigest()[:12]
        # Cache under a per-user 0700 directory, never the shared world-
        # writable tmpdir: CDLL runs library constructors before our
        # parity self-check, so a .so pre-planted by another local user
        # at a predictable shared path would execute arbitrary code.
        cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        cache_dir = os.path.join(cache_root, "newscrawl")
        try:
            os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        except OSError:
            cache_dir = tempfile.mkdtemp(prefix="newscrawl_fp_")  # 0700 by spec
        so_path = os.path.join(cache_dir, f"newscrawl_fp_{tag}.so")
        if os.path.exists(so_path):
            st = os.stat(so_path)
            # refuse a cached library we don't own or that others can write
            if st.st_uid != os.getuid() or (st.st_mode & 0o022):
                raise RuntimeError("untrusted cached .so — refusing to load")
        else:
            src_path = so_path + f".{os.getpid()}.c"
            with open(src_path, "w") as f:
                f.write(_SRC)
            tmp_so = so_path + f".{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp_so, so_path)  # atomic publish
            os.unlink(src_path)
        lib = ctypes.CDLL(so_path)
        lib.fp_min.restype = ctypes.c_uint64
        lib.fp_min.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        # self-check against the Python spec before trusting it
        from .extract import rolling_fingerprint

        probe = "probe text " * 40 + "end"
        if _fp_with(lib, probe) != rolling_fingerprint(probe):  # pragma: no cover
            raise RuntimeError("native fingerprint disagrees with spec")
        _lib = lib
    except Exception:  # no compiler / sandboxed tmp / anything: fall back
        _lib = False
    return _lib


def _fp_with(lib, text: str) -> str:
    from .extract import _FP_BASE, _FP_MOD, _FP_WINDOW

    data = (text or "").encode("utf-8")
    if not data:
        return "0" * 16
    # top = B^(w-1): only consumed by the rolling loop, which only runs
    # when n > w — where w is exactly _FP_WINDOW (the C side clamps w to
    # n for the single-window case, leaving top unused)
    top = pow(_FP_BASE, _FP_WINDOW - 1, _FP_MOD)
    v = lib.fp_min(data, len(data), _FP_WINDOW, _FP_BASE, top)
    return f"{v:016x}"


def get_fingerprint_fn(fallback):
    """The fastest available fingerprint function: the native kernel if
    the cached .so loads (compiling it on first use), else ``fallback``
    (the pure-Python spec). Resolve INSIDE the Arrow kernel so each
    executor worker picks its own path."""
    lib = _load()
    if not lib:
        return fallback
    return lambda text: _fp_with(lib, text)

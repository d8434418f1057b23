"""Shared utilities: array conversion, RNG plumbing, dtype defaults, logging.

The reference library (rballester/tntorch) leans on PyTorch global state
(default dtype, global RNG). JAX is functional/explicit, so this module provides
the thin shims that keep the flat `tn.*` API ergonomic:

- a process-level PRNG key stream (`next_key`) so `tn.rand(...)` works without
  threading keys, while still allowing explicit `key=` arguments everywhere;
- `asarray` that accepts NumPy / PyTorch / JAX inputs;
- `default_dtype()` that respects `jax.config.jax_enable_x64`.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("tntorch_tpu")

_state = threading.local()  # per-thread scratch (non-PRNG uses)
_key_state = {"key": None}
_key_lock = threading.Lock()


class trace_annotation:
    """Context manager adding a jax.profiler TraceAnnotation (no-op if the
    profiler is unavailable). Used around the library's hot phases so traces
    collected with jax.profiler show labelled spans."""

    def __init__(self, name: str):
        self.name = name
        self._cm = None

    def __enter__(self):
        try:
            self._cm = jax.profiler.TraceAnnotation(self.name)
            self._cm.__enter__()
        except Exception:
            self._cm = None
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            return self._cm.__exit__(*exc)
        return False


_PRECISION_MODES = ("highest", "high", "default", "bf16")
_precision_policy = "highest"


def set_policy(precision: str) -> None:
    """Set the library-wide matmul precision policy (SURVEY.md hard part #5).

    - ``"highest"`` (default): full-precision matmuls — on TPU, f32 inputs
      use 6-pass bf16 emulation. The mode every f64 parity test runs in.
    - ``"high"``: 3-pass bf16 on TPU (~1e-6 relative error per contraction).
    - ``"default"``: XLA's fastest mode — single-pass bf16 multiplies with
      f32 accumulation on TPU (~1e-3 per contraction).
    - ``"bf16"``: kernels additionally cast their large operands to bfloat16
      and keep f32 accumulation + f32 factorizations (eigh/cholesky/solves).
      Expect ~1e-2 relative error; use when HBM bandwidth dominates.

    The policy also selects ALGORITHM variants, not just matmul passes:
    every performance mode ('high'/'default'/'bf16') switches the
    orthogonalization sweeps to CholeskyQR2 and the Gram-rounding
    truncation edges to randomized subspace iteration (quasi-optimal
    truncation, no eigh — the library's fastest kernels); ``"highest"``
    keeps Householder QR and exact eigh everywhere.

    Error-budget consequence: `eps`-driven rounding decisions compare
    singular-value tails against eps*||t||; below the mode's contraction
    error (see above) the decisions become noise, so eps targets tighter
    than ~10x the per-contraction error are not meaningful in the lower
    modes. Kernels that accept a ``precision=`` argument use it over the
    policy; eager jnp code paths follow jax's own default unless jitted
    under `jax.default_matmul_precision`.
    """
    global _precision_policy
    if precision not in _PRECISION_MODES:
        raise ValueError(f"precision must be one of {_PRECISION_MODES}")
    _precision_policy = precision


def get_policy() -> str:
    """Current library-wide matmul precision policy (see set_policy)."""
    return _precision_policy


def resolve_precision(precision=None) -> str:
    """Explicit precision arg if given, else the library policy."""
    return _precision_policy if precision is None else precision


def matmul_precision(precision=None) -> str:
    """The `jax.default_matmul_precision` mode implied by the (resolved)
    policy. 'bf16' means bf16 OPERANDS inside the kernels that implement it;
    for eager contraction chains it maps to single-pass 'default'.

    Eager paths need this explicitly: on TPU the ambient default is
    single-pass bf16 for f32 inputs, so un-pinned einsum chains would carry
    ~1e-3 noise even under the 'highest' policy (caught by
    tests/test_tpu_live.py — the CPU suite never sees it because XLA-CPU
    f32 matmuls are exact-f32 at every mode)."""
    p = resolve_precision(precision)
    return "default" if p == "bf16" else p


def policy_precision(fn):
    """Decorator: run an eager contraction function under the policy's
    matmul precision (see `matmul_precision`). The context participates in
    jit trace-cache keys, so policy changes retrace rather than reuse."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision(matmul_precision()):
            return fn(*args, **kwargs)

    return wrapper


def enable_compilation_cache(path=None):
    """Enable JAX's persistent compilation cache (recommended on TPU, where
    first-time compilation of the many small shapes dominates; do NOT share
    the cache directory across heterogeneous CPU hosts)."""
    import os

    path = path or os.environ.get(
        "TNTORCH_TPU_CACHE", os.path.expanduser("~/.cache/tntorch_tpu_xla")
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _patch_atomic_cache_writes()


def shared_cache_env(env=None):
    """setdefault the persistent-compilation-cache env entries for a CHILD
    process so it warm-starts from the same cache as the test suite.

    tests/conftest.py configures the cache in-process via ``jax.config``,
    which subprocesses do not inherit; the hermetic multichip dryrun
    (``__graft_entry__._dryrun_subprocess``) and the examples runner
    (``tests/test_examples.py``) must agree with it on the directory and
    admission thresholds or their ~40 programs recompile on every run
    (~5 min each, the slowest tests in the suite). One helper so the values
    cannot drift apart. Returns the mutated dict (a copy of ``os.environ``
    when ``env`` is None)."""
    import os
    import tempfile

    env = dict(os.environ) if env is None else env
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.environ.get(
            "TNT_TEST_CACHE",
            os.path.join(tempfile.gettempdir(), "tnt_test_xla_cache"),
        ),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    return env


def _patch_atomic_cache_writes():
    """Harden jax's on-disk compilation cache: atomic writes + checksummed
    reads + stale-tmp cleanup.

    jax 0.9's ``lru_cache.LRUCache.put`` ends in a plain
    ``cache_path.write_bytes(val)``: a process killed mid-write (CI teardown,
    OOM, ctrl-C) or two processes writing the same key concurrently (xdist
    workers, example subprocesses sharing the suite cache) can leave a
    truncated/interleaved entry. Such an entry may still zstd-decompress
    (frame-aligned truncation), and ``backend.deserialize_executable`` on the
    mangled bytes SEGFAULTS the next process that warm-starts from the cache
    (observed on this repo's suite after harness-killed runs; stack ends in
    ``compilation_cache.get_executable_and_time``). Three defenses:

    - ``put`` writes to a tmp file in the same directory and ``os.replace``s
      it (atomic on POSIX): readers only ever see complete entries.
    - ``put`` also records a ``{key}.crc32`` sidecar (length + crc32), and
      ``get`` verifies it before handing bytes to the C++ deserializer; a
      mismatch deletes the entry + sidecar and reports a miss, so the caller
      recompiles and re-puts instead of segfaulting. Entries without a
      sidecar (written by unpatched jax) pass through unverified — the
      format on disk stays plain jax format, readable by any process.
    - the first ``put`` per cache instance sweeps ``*.tmp.*`` droppings
      older than one hour (a process killed between write and replace
      leaves its tmp file behind forever otherwise).

    Applied at import so subprocesses that enable the cache via
    ``JAX_COMPILATION_CACHE_DIR`` env (never calling
    ``enable_compilation_cache``) are protected too."""
    import os
    import time
    import zlib

    try:
        from jax._src import lru_cache as _lru
    except Exception:  # cache layout changed: fall back to jax's own writes
        return
    if getattr(_lru.LRUCache.put, "_tnt_atomic", False):
        return
    _orig_put = _lru.LRUCache.put
    _orig_get = _lru.LRUCache.get

    def _sig(val: bytes) -> bytes:
        return f"{len(val)}:{zlib.crc32(val):08x}".encode()

    def _sweep_stale_tmps(self):
        try:
            now = time.time()
            for p in self.path.glob("*.tmp.*"):
                # self.path is etils epath when installed: its stat() result
                # spells mtime without the POSIX st_ prefix
                st = p.stat()
                mtime = getattr(st, "st_mtime", None)
                if mtime is None:
                    mtime = getattr(st, "mtime", now)
                if now - mtime > 3600.0:
                    os.unlink(str(p))
        except (AttributeError, OSError):
            pass

    def put(self, key, val):
        if not key or getattr(self, "eviction_enabled", False):
            # Eviction mode holds a dir lock and bookkeeps sizes — keep
            # jax's own logic there (eviction is off unless the user sets
            # JAX_COMPILATION_CACHE_MAX_SIZE; this repo never does)
            return _orig_put(self, key, val)
        if not getattr(self, "_tnt_swept", False):
            self._tnt_swept = True
            _sweep_stale_tmps(self)
        try:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if cache_path.exists():
                return
            tmp_path = self.path / f"{key}.tmp.{os.getpid()}"
            tmp_path.write_bytes(val)
            os.replace(tmp_path, cache_path)  # same dir: atomic on POSIX
            crc_tmp = self.path / f"{key}.crc32.tmp.{os.getpid()}"
            crc_tmp.write_bytes(_sig(val))
            os.replace(crc_tmp, self.path / f"{key}.crc32")
        except (AttributeError, OSError):
            return _orig_put(self, key, val)

    def get(self, key):
        val = _orig_get(self, key)
        if val is None or not key or getattr(self, "eviction_enabled", False):
            return val
        try:
            crc_path = self.path / f"{key}.crc32"
            if not crc_path.exists():
                return val  # legacy/unpatched-writer entry: pass through
            if crc_path.read_bytes() == _sig(val):
                return val
            # Corrupt (or torn by an unpatched writer racing the sidecar):
            # drop both files and report a miss — the caller recompiles and
            # re-puts a clean entry instead of segfaulting on deserialize.
            (self.path / f"{key}{_lru._CACHE_SUFFIX}").unlink(missing_ok=True)
            crc_path.unlink(missing_ok=True)
            return None
        except (AttributeError, OSError):
            return val

    put._tnt_atomic = True
    get._tnt_atomic = True
    _lru.LRUCache.put = put
    _lru.LRUCache.get = get
    _patch_quarantine_on_crash()


_persist_cache_suppressed = threading.local()


def _cache_suppressed() -> bool:
    return getattr(_persist_cache_suppressed, "on", False)


def suppress_persistent_cache():
    """Context manager: skip persistent-compilation-cache reads AND writes
    for compiles issued on this thread while active.

    Implemented in this library's cache-guard layer (see
    _patch_quarantine_on_crash) because jax's own
    ``jax_enable_compilation_cache`` flag is memoized process-globally on
    first use (compilation_cache.is_cache_used) — toggling it mid-process
    has no effect. Used around programs whose serialization is known to
    crash XLA:CPU (the vmapped batched-minimize chunk)."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        prev = getattr(_persist_cache_suppressed, "on", False)
        _persist_cache_suppressed.on = True
        try:
            yield
        finally:
            _persist_cache_suppressed.on = prev

    return _cm()


def _sweep_dead_intents(d):
    """Quarantine cache entries named by intent files of DEAD pids (their
    deserialization crashed the process; see _patch_quarantine_on_crash)."""
    import os

    try:
        for name in os.listdir(d):
            if not name.startswith(".inflight."):
                continue
            try:
                pid = int(name.rsplit(".", 1)[1])
            except ValueError:
                continue
            if pid == os.getpid() or os.path.exists(f"/proc/{pid}"):
                continue  # our own, or a live process mid-deserialize
            p = os.path.join(d, name)
            try:
                key = open(p).read().strip()
            except OSError:
                key = ""
            if key and os.sep not in key:
                for suffix in ("-cache", ".crc32"):
                    try:
                        os.unlink(os.path.join(d, key + suffix))
                    except OSError:
                        pass
            try:
                os.unlink(p)
            except OSError:
                pass
    except OSError:
        pass


def _patch_quarantine_on_crash():
    """Self-healing guard for cache entries that CRASH the deserializer.

    CRC sidecars (above) catch torn bytes, but an entry can be bytewise
    intact and still segfault ``backend.deserialize_executable`` (XLA's CPU
    custom-call deserialization is fragile; observed once on this repo's
    suite with a CRC-valid entry). A segfault cannot be caught in-process,
    so instead: every cache-backed deserialization first records its key in
    a per-pid intent file next to the cache (one tiny write), and removes
    it on success. On startup, intent files whose pid is DEAD mark entries
    that took a process down — those entries (and their sidecars) are
    deleted so the next run recompiles instead of crashing the same way."""
    import os

    try:
        from jax._src import compilation_cache as _cc
    except Exception:
        return
    if getattr(_cc.get_executable_and_time, "_tnt_guard", False):
        return
    _orig = _cc.get_executable_and_time

    def _cache_dir():
        import jax

        d = jax.config.jax_compilation_cache_dir
        return d if d else os.environ.get("JAX_COMPILATION_CACHE_DIR")

    _swept = [False]

    def guarded(cache_key, compile_options, backend, executable_devices):
        if _cache_suppressed():
            return None, None
        d = _cache_dir()
        if not d or not os.path.isdir(d):
            return _orig(cache_key, compile_options, backend,
                         executable_devices)
        if not _swept[0]:
            _swept[0] = True
            _sweep_dead_intents(d)
        intent = os.path.join(d, f".inflight.{os.getpid()}")
        try:
            with open(intent, "w") as f:
                f.write(cache_key)
        except OSError:
            return _orig(cache_key, compile_options, backend,
                         executable_devices)
        try:
            return _orig(cache_key, compile_options, backend,
                         executable_devices)
        finally:
            try:
                os.unlink(intent)
            except OSError:
                pass

    guarded._tnt_guard = True
    _cc.get_executable_and_time = guarded

    # Write-side guard: do not persistent-cache executables compiled for a
    # PARTIAL set of the client's devices (e.g. a 4-of-8 CPU submesh).
    # XLA:CPU's LoadedExecutable.serialize() has been observed to abort the
    # process on such programs in long test runs (and a surviving entry
    # segfaulted deserialize in a later process); the programs are small,
    # so recompiling them costs seconds while a crash costs the whole run.
    _orig_put = _cc.put_executable_and_time

    def guarded_put(cache_key, module_name, executable, backend,
                    compile_time):
        if _cache_suppressed():
            return
        try:
            edevs = executable.local_devices()
            ndev = len(backend.local_devices())
            if 1 < len(edevs) < ndev:
                return
        except Exception:
            pass
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)

    guarded_put._tnt_guard = True
    _cc.put_executable_and_time = guarded_put


_patch_atomic_cache_writes()


def seed(s: int) -> None:
    """Seed the process-level PRNG stream used when no explicit key is given.

    The stream is genuinely process-wide (guarded by a lock), so seeding in
    one thread governs draws made from any thread — thread-local state would
    silently fall back to OS entropy in worker threads."""
    with _key_lock:
        _key_state["key"] = jax.random.key(s)


def next_key(key: Optional[jax.Array] = None) -> jax.Array:
    """Return a fresh PRNG key (from `key` if given, else the global stream)."""
    if key is not None:
        return key
    with _key_lock:
        if _key_state["key"] is None:
            _key_state["key"] = jax.random.key(np.random.SeedSequence().entropy % (2**63))
        _key_state["key"], sub = jax.random.split(_key_state["key"])
    return sub


def default_dtype() -> jnp.dtype:
    """float64 under jax_enable_x64, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _torch_to_numpy(x) -> np.ndarray:
    t = x.detach().cpu()
    try:
        return t.numpy()
    except TypeError:
        # NumPy has no bfloat16 (torch's common accelerator dtype): widen
        # to float32 — lossless, since bf16 is a truncated f32
        return t.float().numpy()


def asarray(x: Any, dtype: Optional[Any] = None) -> jax.Array:
    """Convert NumPy / PyTorch / JAX / compressed-Tensor / scalar input to
    a jnp array (tn.Tensor densifies via to_numpy — same size guard)."""
    mod = type(x).__module__
    if mod.startswith("torch"):
        x = _torch_to_numpy(x)
    elif hasattr(x, "cores") and hasattr(x, "numpy"):
        x = to_numpy(x)
    return jnp.asarray(x, dtype=dtype)


def take_mode(arr: jax.Array, idx) -> jax.Array:
    """``arr[..., idx, :]`` — gather along the mode axis (-2).

    On accelerator backends with a large 1-D index, the gather is computed
    as a one-hot matmul instead: TPU lowers a big fancy-gather followed by
    the TT chain's batched tiny matvecs poorly, while the equivalent
    (P, I) x (I, r*s) product is MXU-shaped — measured 1.8x faster for the
    completion training step (P=20k, I=64, r=8) with f32-exact values (the
    one-hot GEMM is pinned to HIGHEST precision: it replaces an exact
    gather, so it must not inherit a lossy ambient matmul mode; bf16
    single-pass would round every gathered value by ~4e-3). Small, scalar,
    integer-dtype, or CPU-side gathers take the plain path."""
    if (
        getattr(idx, "ndim", None) == 1
        and getattr(arr, "ndim", 0) >= 2
        and jnp.issubdtype(arr.dtype, jnp.floating)
        and int(idx.shape[0]) >= 512
        and int(arr.shape[-2]) * int(idx.shape[0]) <= 100_000_000
        and jax.default_backend() != "cpu"
    ):
        E = jax.nn.one_hot(idx, arr.shape[-2], dtype=arr.dtype)
        return jnp.einsum(
            "pi,...is->...ps", E, arr, precision=jax.lax.Precision.HIGHEST
        )
    return arr[..., idx, :]


def to_numpy(x: Any) -> np.ndarray:
    """Convert torch/jax/NumPy/compressed-Tensor input to a NumPy array.

    A ``tn.Tensor`` decompresses via ``.numpy()`` — the natural pairing
    ``tn.sparse_tt_svd(X, t[X])`` hands the sampled values over as a small
    1-D Tensor, and ``np.asarray`` on it raises an opaque "setting an array
    element with a sequence". Large compressed tensors (> 5e7 entries) are
    refused with a typed error instead of silently materializing gigabytes."""
    mod = type(x).__module__
    if mod.startswith("torch"):
        return _torch_to_numpy(x)
    if hasattr(x, "cores") and hasattr(x, "numpy"):  # tn.Tensor
        n = float(x.numel())
        if n > 5e7:
            raise TypeError(
                "Refusing to densify a compressed Tensor with {:g} entries "
                "into a NumPy array; pass raw sample values (e.g. "
                "t[X].numpy() on a small index set) instead".format(n)
            )
        return np.asarray(x.numpy())
    return np.asarray(x)


def is_scalar(x: Any) -> bool:
    """True for Python/NumPy scalar-like values."""
    if isinstance(x, (int, float, complex, np.integer, np.floating, np.complexfloating)):
        return True
    if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", None) == 0:
        return True
    return False

"""XLA_FLAGS helpers that must run before backend initialization.

Importing this module pulls in nothing heavy (no jax) so entry points can
call it first thing. XLA_FLAGS is read when the first backend is created
(the first ``jax.devices()``/computation), not at ``import jax`` — so
mutating ``os.environ`` here is effective as long as no backend exists
yet.
"""

from __future__ import annotations

import os

_SCHED_FLAG = "--xla_cpu_enable_concurrency_optimized_scheduler=false"
_FAST_COMPILE_FLAG = "--xla_backend_optimization_level=0"


def ensure_cpu_collective_program_order() -> None:
    """Keep XLA:CPU collectives in program order on virtual multi-device
    meshes.

    The concurrency-optimized thunk scheduler lets different virtual-device
    threads reach independent collectives in different orders, which
    deadlocks the in-process rendezvous (reproduced with a TP=2 mesh +
    AdamSPD: all 8 device threads block in three different collectives —
    a cycle; raising the rendezvous timeouts does not help). TPU executes
    collectives in per-core program order and is unaffected.

    Call from every entry point that builds a multi-device CPU mesh
    (tests/conftest.py, ``__graft_entry__.py``, tests/mp_worker.py).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _SCHED_FLAG).strip()


def enable_persistent_compilation_cache() -> None:
    """Cache compiled XLA executables on disk across processes.

    TPU compiles in this deployment ride a remote-compile service at
    ~6 min per program with no cross-process reuse; the JAX persistent
    cache keys serialized executables by (HLO, compile options,
    platform) so a re-run of an already-compiled program loads in
    seconds. Opt out with CFA_COMPILE_CACHE=0; point CFA_COMPILE_CACHE
    at a directory to relocate it. Backends that cannot serialize
    executables just log a warning and compile as before — enabling is
    never worse. Call AFTER jax import, BEFORE the first computation.
    """
    import jax

    loc = os.environ.get("CFA_COMPILE_CACHE", "")
    if loc == "0":
        return
    jax.config.update(
        "jax_compilation_cache_dir",
        loc or os.path.expanduser("~/.cache/cfa_xla_cache"))
    # Small programs recompile fast anyway; only persist the painful ones.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def ensure_fast_cpu_compile() -> None:
    """Cut XLA:CPU compile latency for correctness-only runs.

    ``--xla_backend_optimization_level=0`` skips the expensive LLVM
    optimization pipeline; measured ~40% lower wall time per compiled
    program on this one-core host with bit-identical losses (no fast-math
    is implied — FP association is unchanged, only codegen speed).
    Used by the driver-facing ``dryrun_multichip`` (CPU mesh, tiny shapes,
    oracle-equality asserts) where compile latency — not run speed — is
    the budget. Never applied to TPU entry points.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _FAST_COMPILE_FLAG).strip()

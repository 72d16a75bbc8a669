"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for a fake NCCL process group (the
reference has no distributed tests at all, SURVEY.md §4): XLA hosts 8
virtual CPU devices so every sharding/collective path compiles and runs
in-process.
"""

import os

# The session sitecustomize pre-imports jax pinned to the axon TPU tunnel
# (JAX_PLATFORMS=axon), so mutating os.environ["JAX_PLATFORMS"] here is too
# late — jax.config captured the env at import. Override through the config
# API instead (backends are created lazily at the first jax.devices() call,
# which hasn't happened yet). XLA_FLAGS *is* still read at backend-init
# time, so the env route works for the device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Deadlock workaround for CPU-mesh collectives (see the helper's docstring),
# plus the fast-compile flag: the suite is compile-dominated on this
# one-core host and --xla_backend_optimization_level=0 only skips LLVM
# codegen optimization (no fast-math — FP results unchanged; verified
# bit-identical losses on the dryrun programs, ~40% faster big compiles).
from clip_finegrained_alignment_tpu.core.xla_flags import (  # noqa: E402
    ensure_cpu_collective_program_order, ensure_fast_cpu_compile)

ensure_cpu_collective_program_order()
ensure_fast_cpu_compile()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# Tests run hermetically with no real CLIP vocab file; opt into the
# deterministic HashTokenizer (load_tokenizer fails loudly otherwise —
# the eval CLIs must never silently hash-tokenize, VERDICT.md weak #4).
os.environ.setdefault("CFA_ALLOW_HASH_TOKENIZER", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch fp32; XLA's default matmul precision
# uses fast bf16 passes (on CPU via oneDNN, on TPU via the MXU), which is
# the right *training* default but too loose for golden-value comparison.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

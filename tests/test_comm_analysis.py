"""The HLO-collective accountant (perf/comm_analysis.py) must see exactly
the collectives a known program contains, with the right payload bytes."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "perf"))


def _stats_of(fn, mesh, in_specs, out_specs, *args):
    from comm_analysis import collective_stats
    jf = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False))
    hlo = jf.lower(*args).compile().as_text()
    return collective_stats(hlo)


def test_psum_counts_one_all_reduce(eight_devices):
    mesh = Mesh(np.array(eight_devices), ("data",))
    x = jnp.ones((8, 16, 4), jnp.float32)

    stats = _stats_of(lambda x: jax.lax.psum(x, "data"), mesh,
                      (P("data"),), P(), x)
    assert set(stats) == {"all-reduce"}
    count, payload = stats["all-reduce"]
    assert count == 1
    # per-device payload: [1, 16, 4] f32 = 256 B
    assert payload == 16 * 4 * 4, payload


def test_all_gather_payload(eight_devices):
    mesh = Mesh(np.array(eight_devices), ("data",))
    x = jnp.ones((8, 16, 4), jnp.float32)

    stats = _stats_of(
        lambda x: jax.lax.all_gather(x, "data", axis=0, tiled=True), mesh,
        (P("data"),), P(), x)
    assert set(stats) == {"all-gather"}
    count, payload = stats["all-gather"]
    assert count == 1
    # gathered result: [8, 16, 4] f32 = 2048 B
    assert payload == 8 * 16 * 4 * 4, payload


def test_shape_bytes_tuples_and_dtypes():
    from comm_analysis import _shape_bytes
    assert _shape_bytes("f32[2,3]") == 24
    assert _shape_bytes("(bf16[4,8], s32[2])") == 64 + 8
    assert _shape_bytes("pred[16]") == 16
    assert _shape_bytes("f32[]") == 4  # scalar

"""Keep the driver entry points green: entry() compiles, dryrun_multichip
runs a full SPARC+AdamSPD step on the virtual 8-device mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8(eight_devices):
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() builds ViT-B/32 — heavy for CPU CI, so compile-check the
    same code path shape-only via jax.eval_shape."""
    import jax

    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 4)

"""Driver-contract guard: `__graft_entry__.entry()` must return a jittable
(fn, example_args) pair that compiles and runs single-chip, and the returned
top-k must be well-formed. `dryrun_multichip` is exercised by the driver on
an 8-virtual-device mesh (and its stages have dedicated tests:
test_sharded/test_host_shard/test_multihost); entry() had no in-suite
coverage, so a refactor of `search._probe_search_impl`'s signature could
break the driver's compile check without failing any test.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    dists, ids = jax.jit(fn)(*args)
    dists, ids = np.asarray(dists), np.asarray(ids)
    q = args[1].shape[0]
    assert dists.shape == (q, 10) and ids.shape == (q, 10)
    # distances ascend per row; ids are valid 0-based store rows (these
    # shapes guarantee >= k candidates per query, so the -1 pad sentinel
    # for sub-k coverage never survives the merge)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)
    assert np.isfinite(dists[:, 0]).all()
    assert ids.min() >= 0

import sys

import jax
import numpy as np

sys.path.insert(0, ".")  # repo root, where __graft_entry__.py lives


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_traces():
    """entry() must be jit-traceable; full-scale compile is exercised on the TPU by bench.py,
    here we only validate abstract tracing (CPU compile of the 860M-param UNet is too slow)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1,)
    assert np.issubdtype(out.dtype, np.floating)

"""ops/chunking: full-size windows + single-program row slicing.

These carry the no-per-offset-recompile contract for every chunked loop
(precomputes, kNN queries): see ops/chunking.py's module docstring for the
measured cost of getting this wrong (154 s of remote compiles for 11
chunks).
"""

import numpy as np

from vqa_counterexamples_tpu.ops.chunking import row_slice, windows


def test_windows_cover_exactly_once_with_tail_overlap():
    for n, chunk in [(50, 20), (40, 40), (41, 40), (7, 3), (2048, 2048),
                     (216000 // 100, 2048 // 100), (5, 8)]:
        seen = []
        for s, off in windows(n, chunk):
            size = min(chunk, n)
            assert 0 <= s <= max(n - size, 0)
            rows = list(range(s, s + size))[off:]
            seen.extend(rows)
        assert seen == list(range(n)), (n, chunk)


def test_row_slice_matches_python_slice_and_compiles_once():
    import jax
    import jax.numpy as jnp

    arr = jnp.asarray(np.arange(60).reshape(12, 5))
    # same jitted program object serves every start (one cache entry per
    # (shape, size) — not per offset)
    sizes_before = row_slice._cache_size()
    for s in (0, 3, 7):
        out = np.asarray(row_slice(arr, jnp.int32(s), 4))
        np.testing.assert_array_equal(out, np.arange(60).reshape(12, 5)[s:s + 4])
    assert row_slice._cache_size() == sizes_before + 1

    # clamping: start past n-size returns the last full window
    out = np.asarray(row_slice(arr, jnp.int32(11), 4))
    np.testing.assert_array_equal(out, np.arange(60).reshape(12, 5)[8:12])

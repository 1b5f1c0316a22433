"""Block-count sizing for the exact blocked kNN kernel (ADVICE r9).

The kernel's output is invariant to the block count (its 1-granule
emission is a provable argmax superset under ANY blocking), so these
tests pin the SIZING contract only: the per-block dense sims matrix
(n_q x n/nb float64) stays under the cell cap at any corpus size, and
the floor/cap behave at the edges.
"""

import math

from rad_database_parse_spark.registry.round7ai_ops import (
    _KNN_MAX_BLOCK_CELLS,
    _KNN_NB_MIN,
    _KNN_QUERY_MOD,
    _knn_block_count,
)


def test_small_corpus_hits_the_floor():
    # sf0.01-scale corpora: parallelism floor, matrices tiny
    for n in (0, 1, 100, 2_000, 20_000):
        assert _knn_block_count(n) >= min(_KNN_NB_MIN, max(1, n))


def test_block_matrix_cell_bound_holds_at_scale():
    # the ADVICE r9 failure mode: fixed 16 blocks let n_q*(n/16) grow
    # quadratically. The derived count must keep every per-block matrix
    # under the cap (+1 block of slack for the ceil of n/nb).
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        nb = _knn_block_count(n)
        n_q = max(1, n // _KNN_QUERY_MOD)
        per_block = n_q * math.ceil(n / nb)
        assert per_block <= _KNN_MAX_BLOCK_CELLS + n_q, (n, nb, per_block)


def test_block_count_grows_with_corpus():
    counts = [_knn_block_count(n) for n in (10_000, 100_000, 1_000_000)]
    assert counts == sorted(counts)
    assert counts[-1] > _KNN_NB_MIN  # at 1M rows the cap term dominates


def test_block_count_never_exceeds_rows():
    for n in (1, 5, 17):
        assert _knn_block_count(n) <= max(_KNN_NB_MIN, n)

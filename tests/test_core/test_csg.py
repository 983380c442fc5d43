"""Parity tests for the CSG interval engine.

Truth tables from the reference's TestArrayCSGOperation
(test/test_tinygfx/test_g3d/test_csg.py:212-231) plus id co-sorting.
"""

import numpy as np

from pyrayt_tpu.core.csg import Operation, array_csg, csg_combine_with_ids

ARRAY1 = np.array((1.0, 4.0, 5.0, 10.0))
ARRAY2 = np.array((0.0, 2.0, 3.0, 5.0, 6.0, 7.0, 8.0, 9.0, 11.0, 12.0))


def expected_with_inf(values):
    out = np.full(ARRAY1.shape[0] + ARRAY2.shape[0], np.inf)
    out[: len(values)] = values
    return out


class TestArrayCSG:
    def test_union(self):
        unioned = np.asarray(array_csg(ARRAY1, ARRAY2, Operation.UNION))
        assert np.allclose(unioned, expected_with_inf([0, 10, 11, 12]))

    def test_intersect(self):
        intersected = np.asarray(array_csg(ARRAY1, ARRAY2, Operation.INTERSECT))
        assert np.allclose(
            intersected, expected_with_inf([1, 2, 3, 4, 5, 5, 6, 7, 8, 9])
        )

    def test_difference(self):
        diffed = np.asarray(array_csg(ARRAY1, ARRAY2, Operation.DIFFERENCE))
        assert np.allclose(diffed, expected_with_inf([2, 3, 5, 6, 7, 8, 9, 10]))

    def test_2d_columns_are_independent(self):
        a1 = np.stack((ARRAY1, ARRAY1), axis=1)
        a2 = np.stack((ARRAY2, ARRAY2), axis=1)
        out = np.asarray(array_csg(a1, a2, Operation.UNION))
        assert np.allclose(out[:, 0], out[:, 1])
        assert np.allclose(out[:4, 0], [0, 10, 11, 12])

    def test_disjoint_union_keeps_both(self):
        a = np.array([1.0, 2.0])
        b = np.array([5.0, 6.0])
        out = np.asarray(array_csg(a, b, Operation.UNION))
        assert np.allclose(out, [1, 2, 5, 6])

    def test_disjoint_intersect_empty(self):
        a = np.array([1.0, 2.0])
        b = np.array([5.0, 6.0])
        out = np.asarray(array_csg(a, b, Operation.INTERSECT))
        assert np.all(np.isinf(out))

    def test_difference_no_overlap_keeps_left(self):
        a = np.array([1.0, 2.0])
        b = np.array([5.0, 6.0])
        out = np.asarray(array_csg(a, b, Operation.DIFFERENCE))
        assert np.allclose(out[:2], [1, 2])

    def test_miss_encoded_as_inf_pair(self):
        a = np.array([np.inf, np.inf])
        b = np.array([1.0, 2.0])
        out = np.asarray(array_csg(a, b, Operation.UNION))
        assert np.allclose(out[:2], [1, 2])
        out = np.asarray(array_csg(a, b, Operation.INTERSECT))
        assert np.all(np.isinf(out))


class TestCombineWithIds:
    def test_union_ids_follow_hits(self):
        l_hits = np.array([[1.0], [2.0]])
        r_hits = np.array([[5.0], [6.0]])
        l_ids = np.full((2, 1), 7)
        r_ids = np.full((2, 1), 9)
        hits, ids = csg_combine_with_ids(
            l_hits, l_ids, r_hits, r_ids, Operation.UNION
        )
        hits, ids = np.asarray(hits), np.asarray(ids)
        assert np.allclose(hits[:, 0], [1, 2, 5, 6])
        assert list(ids[:, 0]) == [7, 7, 9, 9]

    def test_intersect_ids(self):
        # [1,4] & [2,6] -> [2,4]: entry from right, exit from left
        l_hits = np.array([[1.0], [4.0]])
        r_hits = np.array([[2.0], [6.0]])
        l_ids = np.full((2, 1), 7)
        r_ids = np.full((2, 1), 9)
        hits, ids = csg_combine_with_ids(
            l_hits, l_ids, r_hits, r_ids, Operation.INTERSECT
        )
        hits, ids = np.asarray(hits), np.asarray(ids)
        assert np.allclose(hits[:2, 0], [2, 4])
        assert list(ids[:2, 0]) == [9, 7]
        assert np.all(np.isinf(hits[2:, 0]))

    def test_difference_ids(self):
        # [0,10] - [2,4] -> [0,2] u [4,10]; boundary at 2 and 4 from right
        l_hits = np.array([[0.0], [10.0]])
        r_hits = np.array([[2.0], [4.0]])
        l_ids = np.full((2, 1), 7)
        r_ids = np.full((2, 1), 9)
        hits, ids = csg_combine_with_ids(
            l_hits, l_ids, r_hits, r_ids, Operation.DIFFERENCE
        )
        hits, ids = np.asarray(hits), np.asarray(ids)
        assert np.allclose(hits[:, 0], [0, 2, 4, 10])
        assert list(ids[:, 0]) == [7, 9, 9, 7]

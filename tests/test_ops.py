"""Property and semantics tests for the mutation primitives.

Oracle strategy (the reference has no test suite; SURVEY.md section 4):
- structural invariants after every op (the reference's halt-on-corruption
  checks, cuda_lib_gl.py:1528-1555),
- stored start_bp / l_cont / l_cont_bp always equal the from-scratch
  derivation (renormalize),
- hand-computed expectations for each op on small genomes.
"""

import numpy as np
import pytest

from graal_tpu.core import ops
from graal_tpu.core.state import GenomeState, check_invariants, renormalize
from graal_tpu.core.candidates import build_candidates, mh_candidates, N_CANDIDATES
from tests.conftest import make_random_state


def linear_state(sizes, len_bp=None):
    """Contigs laid out consecutively: frag ids 0..n-1 in order."""
    n = sum(sizes)
    if len_bp is None:
        len_bp = np.full(n, 1000, np.int32)
    len_bp = np.asarray(len_bp, np.int32)
    pos, id_c, start, l_cont, l_cont_bp = [], [], [], [], []
    f = 0
    for c, size in enumerate(sizes):
        off = 0
        for p in range(size):
            pos.append(p)
            id_c.append(c)
            start.append(off)
            off += int(len_bp[f])
            f += 1
        l_cont.extend([size] * size)
        l_cont_bp.extend([off] * size)
    return GenomeState.from_soa(dict(
        pos=pos, id_c=id_c, start_bp=start, len_bp=len_bp,
        circ=np.zeros(n), l_cont=l_cont, l_cont_bp=l_cont_bp,
        ori=np.ones(n), rep=np.zeros(n), activ=np.ones(n),
        id_d=np.arange(n)))


def contig_order(state, c):
    """Fragment ids of contig c in position order."""
    s = state.to_numpy()
    sel = np.nonzero(s["id_c"] == c)[0]
    return list(sel[np.argsort(s["pos"][sel])])


def contig_of(state, f):
    return int(np.asarray(state.id_c)[f])


class TestPopOut:
    def test_middle(self):
        s = linear_state([5])
        out = ops.pop_out(s, 2, int(np.max(np.asarray(s.id_c))))
        check_invariants(out)
        assert contig_order(out, 0) == [0, 1, 3, 4]
        c_new = contig_of(out, 2)
        assert c_new != 0
        assert contig_order(out, c_new) == [2]
        assert int(out.l_cont[0]) == 4
        assert int(out.l_cont_bp[0]) == 4000

    def test_two_frag_contig_collapses(self):
        s = linear_state([2, 3])
        out = ops.pop_out(s, 0, 1)
        check_invariants(out)
        assert int(out.l_cont[1]) == 1
        assert int(out.circ[1]) == 0

    def test_singleton_identity(self):
        s = linear_state([1, 4])
        out = ops.pop_out(s, 0, 1)
        np.testing.assert_array_equal(np.asarray(out.id_c), np.asarray(s.id_c))

    def test_circular_stays_circular(self):
        s = linear_state([4])
        s = s._replace(circ=np.ones(4, np.int32) * 0)
        circ = ops.paste(s, 0, 3, 0)  # circularise
        assert int(circ.circ[0]) == 1
        out = ops.pop_out(circ, 1, int(np.max(np.asarray(circ.id_c))))
        check_invariants(out)
        rest = [f for f in range(4) if f != 1]
        assert all(int(out.circ[f]) == 1 for f in rest)
        assert int(out.circ[1]) == 0


class TestPopIn:
    def test_pop_in_3_insert_right(self):
        s = linear_state([1, 4])  # frag 0 singleton; contig 1 = [1,2,3,4]
        out = ops.pop_in_3(s, 0, 2, -1, 1)
        check_invariants(out)
        assert contig_order(out, 1) == [1, 2, 0, 3, 4]
        assert int(out.ori[0]) == -1
        assert int(out.l_cont[1]) == 5

    def test_pop_in_4_insert_left(self):
        s = linear_state([1, 4])
        out = ops.pop_in_4(s, 0, 2, 1, 1)
        check_invariants(out)
        assert contig_order(out, 1) == [1, 0, 2, 3, 4]

    def test_pop_in_1_split_left(self):
        s = linear_state([1, 4])
        out = ops.pop_in_1(s, 0, 3, 1, 1)
        check_invariants(out)
        # left remainder keeps contig 1; new contig = [0, 3, 4]
        assert contig_order(out, 1) == [1, 2]
        c_new = contig_of(out, 0)
        assert contig_order(out, c_new) == [0, 3, 4]

    def test_pop_in_2_split_right(self):
        s = linear_state([1, 4])
        out = ops.pop_in_2(s, 0, 2, 1, 1)
        check_invariants(out)
        assert contig_order(out, 1) == [1, 2, 0]
        c_new = contig_of(out, 3)
        assert contig_order(out, c_new) == [3, 4]

    def test_pop_in_inactive_guard(self):
        s = linear_state([1, 4])
        s = s._replace(activ=np.asarray([0, 1, 1, 1, 1], np.int32))
        out = ops.pop_in_3(s, 0, 2, 1, 1)
        np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(s.pos))

    def test_pop_in_3_circular_target(self):
        s = linear_state([1, 4])
        circ = ops.paste(s, 1, 4, 1)  # circularise contig 1
        assert int(circ.circ[1]) == 1
        out = ops.pop_in_3(circ, 0, 2, 1, int(np.max(np.asarray(circ.id_c))))
        check_invariants(out)
        assert int(out.circ[0]) == 1  # circ preserved (kernels3.cu:1140)
        assert contig_order(out, 1) == [1, 2, 0, 3, 4]


class TestSplitPaste:
    def test_split_upstream(self):
        s = linear_state([5])
        out = ops.split(s, 2, 1, 0)
        check_invariants(out)
        assert contig_order(out, 0) == [0, 1]
        c_new = contig_of(out, 2)
        assert contig_order(out, c_new) == [2, 3, 4]

    def test_split_downstream(self):
        s = linear_state([5])
        out = ops.split(s, 2, 0, 0)
        check_invariants(out)
        assert contig_order(out, 0) == [0, 1, 2]
        c_new = contig_of(out, 3)
        assert contig_order(out, c_new) == [3, 4]

    def test_split_circular_linearises(self):
        s = linear_state([5])
        circ = ops.paste(s, 0, 4, 0)
        out = ops.split(circ, 2, 1, int(np.max(np.asarray(circ.id_c))))
        check_invariants(out)
        assert contig_order(out, 0) == [2, 3, 4, 0, 1]
        assert int(out.circ[0]) == 0

    def test_paste_tail_to_head(self):
        s = linear_state([2, 3])
        out = ops.paste(s, 1, 2, 1)  # frag1 = tail of c0, frag2 = head of c1
        check_invariants(out)
        assert contig_order(out, 0) == [0, 1, 2, 3, 4]
        assert list(np.asarray(out.ori)) == [1] * 5

    def test_paste_head_to_head_reverses_A(self):
        s = linear_state([2, 3])
        out = ops.paste(s, 0, 2, 1)
        check_invariants(out)
        assert contig_order(out, 0) == [1, 0, 2, 3, 4]
        ori = np.asarray(out.ori)
        assert list(ori[:2]) == [-1, -1] and list(ori[2:]) == [1, 1, 1]

    def test_paste_tail_to_tail_reverses_B(self):
        s = linear_state([2, 3])
        out = ops.paste(s, 1, 4, 1)
        check_invariants(out)
        assert contig_order(out, 0) == [0, 1, 4, 3, 2]
        ori = np.asarray(out.ori)
        assert list(ori[:2]) == [1, 1] and list(ori[2:]) == [-1, -1, -1]

    def test_paste_same_contig_circularises(self):
        s = linear_state([4])
        out = ops.paste(s, 0, 3, 0)
        assert all(int(out.circ[f]) == 1 for f in range(4))
        # non-extremity pair: identity
        out2 = ops.paste(s, 1, 2, 0)
        np.testing.assert_array_equal(np.asarray(out2.circ), np.asarray(s.circ))


class TestFlipSwap:
    def test_flip(self):
        s = linear_state([3])
        out = ops.flip(s, 1)
        assert int(out.ori[1]) == -1
        assert int(out.ori[0]) == 1

    def test_swap_activity_norep_identity(self):
        s = linear_state([3])
        out = ops.swap_activity(s, 1, 2)
        np.testing.assert_array_equal(np.asarray(out.activ), np.asarray(s.activ))

    def test_swap_activity_repeat(self):
        s = linear_state([1, 3])
        s = s._replace(rep=np.asarray([1, 0, 0, 0], np.int32))
        out = ops.swap_activity(s, 0, 1)
        assert int(out.activ[0]) == 0
        assert int(out.id_c[0]) == 0  # deactivation keeps contig id
        out2 = ops.swap_activity(out, 0, int(np.max(np.asarray(out.id_c))))
        assert int(out2.activ[0]) == 1
        assert int(out2.id_c[0]) == int(np.max(np.asarray(out.id_c))) + 1


@pytest.mark.parametrize("with_circ", [False, True])
def test_random_op_sequences_keep_invariants(rng, with_circ):
    """Fuzz: long random sequences of committed candidates never corrupt the
    state (reference oracle: modify_genome checks, cuda_lib_gl.py:1521-1537)."""
    import jax

    state = make_random_state(rng, n_frags=20, n_contigs=4, with_circ=with_circ)
    check_invariants(state)
    n = state.n_frags
    step = jax.jit(lambda s, fa, fb, m: jax.tree.map(
        lambda x: x[m], build_candidates(s, fa, fb)))
    for it in range(100):
        f_a = int(rng.integers(n))
        f_b = int(rng.integers(n))
        mode = int(rng.integers(N_CANDIDATES))
        state = step(state, f_a, f_b, mode)
        errors = check_invariants(state, raise_on_error=False)
        assert not errors, f"iter {it} op {mode} fA={f_a} fB={f_b}: {errors}"


def test_random_mh_sequences_keep_invariants(rng):
    import jax

    state = make_random_state(rng, n_frags=18, n_contigs=3, with_circ=True)
    n = state.n_frags
    step = jax.jit(lambda s, fa, fb, m: jax.tree.map(
        lambda x: x[m], mh_candidates(s, fa, fb)))
    for it in range(80):
        f_a = int(rng.integers(n))
        f_b = int(rng.integers(n))
        mode = int(rng.integers(N_CANDIDATES))
        state = step(state, f_a, f_b, mode)
        errors = check_invariants(state, raise_on_error=False)
        assert not errors, f"iter {it} op {mode} fA={f_a} fB={f_b}: {errors}"


def test_renormalize_matches_linear_state():
    s = linear_state([3, 2], len_bp=[100, 200, 300, 400, 500])
    r = renormalize(s)
    np.testing.assert_array_equal(np.asarray(r.start_bp), np.asarray(s.start_bp))
    np.testing.assert_array_equal(np.asarray(r.l_cont), np.asarray(s.l_cont))
    np.testing.assert_array_equal(np.asarray(r.l_cont_bp), np.asarray(s.l_cont_bp))

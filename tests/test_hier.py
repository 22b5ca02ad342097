"""Tests for the taxonomy-tree algebra and hierarchical losses.

Tree used throughout (indices in BFS order):

    0 root
    ├── 1 A
    │   ├── 3 C (leaf)
    │   └── 4 D
    │       └── 6 F (leaf)
    └── 2 B
        └── 5 E (leaf)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vamb_tpu.models import hier
from vamb_tpu.taxonomy import ContigTaxonomy

PARENTS = [-1, 0, 0, 1, 1, 2, 4]


@pytest.fixture
def tree():
    return hier.Hierarchy(np.array(PARENTS))


class TestHierarchy:
    def test_basic(self, tree):
        assert tree.num_nodes() == 7
        np.testing.assert_array_equal(tree.num_children(), [2, 2, 1, 0, 1, 0, 0])
        np.testing.assert_array_equal(
            tree.leaf_mask(), [0, 0, 0, 1, 0, 1, 1]
        )
        np.testing.assert_array_equal(tree.depths(), [0, 1, 1, 2, 2, 2, 3])
        assert tree.num_leaf_nodes() == 3
        np.testing.assert_array_equal(
            tree.num_leaf_descendants(), [3, 2, 1, 1, 1, 1, 1]
        )

    def test_ancestor_mask(self, tree):
        m = tree.ancestor_mask(strict=False)
        assert m[0, 6] and m[1, 6] and m[4, 6] and m[6, 6]
        assert not m[2, 6] and not m[3, 6]
        strict = tree.ancestor_mask(strict=True)
        assert not strict[6, 6] and strict[4, 6]

    def test_paths_padded(self, tree):
        p = tree.paths_padded(-1)
        np.testing.assert_array_equal(p[6], [0, 1, 4, 6])
        np.testing.assert_array_equal(p[3], [0, 1, 3, -1])

    def test_topology_validation(self):
        with pytest.raises(ValueError):
            hier.Hierarchy(np.array([-1, 2, 1]))  # parent after child

    def test_find_lca(self, tree):
        lca = hier.FindLCA(tree)
        assert lca(np.array([3]), np.array([6]))[0] == 1
        assert lca(np.array([5]), np.array([6]))[0] == 0
        assert lca(np.array([4]), np.array([6]))[0] == 4


class TestMakeGraph:
    def test_bfs_order_and_parents(self):
        taxes = [
            ContigTaxonomy(["A", "D", "F"]),
            ContigTaxonomy(["A", "C"]),
            ContigTaxonomy(["B", "E"]),
            None,
            ContigTaxonomy([]),
        ]
        nodes, ind, parents = hier.make_graph(taxes)
        assert nodes[0] == "root"
        assert set(nodes) == {"root", "A", "B", "C", "D", "E", "F"}
        # parent table is topologically sorted
        assert all(p < i for i, p in enumerate(parents) if p >= 0)
        assert parents[ind["F"]] == ind["D"]
        assert parents[ind["D"]] == ind["A"]
        assert parents[ind["A"]] == 0

    def test_ambiguous_parent_raises(self):
        taxes = [ContigTaxonomy(["A", "X"]), ContigTaxonomy(["B", "X"])]
        with pytest.raises(ValueError, match="multiple parents"):
            hier.make_graph(taxes)


class TestLosses:
    def test_flat_softmax_leaf_label(self, tree):
        "For a leaf label, FlatSoftmaxNLL equals standard cross-entropy."
        loss = hier.FlatSoftmaxNLL(tree)
        # leaves are nodes 3, 5, 6 -> columns 0, 1, 2
        scores = jnp.asarray([[1.0, 2.0, 0.5]])
        onehot = jnp.zeros((1, 7)).at[0, 5].set(1.0)  # label node 5 -> leaf col 1
        got = float(loss(scores, onehot))
        expected = -np.log(np.exp(2.0) / np.exp([1.0, 2.0, 0.5]).sum())
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_flat_softmax_internal_label_sums_descendants(self, tree):
        "For internal label A (node 1), NLL = -log(p_leaf3 + p_leaf6)."
        loss = hier.FlatSoftmaxNLL(tree)
        scores = jnp.asarray([[1.0, 2.0, 0.5]])
        p = np.exp([1.0, 2.0, 0.5])
        p /= p.sum()
        onehot = jnp.zeros((1, 7)).at[0, 1].set(1.0)
        got = float(loss(scores, onehot))
        np.testing.assert_allclose(got, -np.log(p[0] + p[2]), rtol=1e-6)

    def test_hier_log_softmax_probabilities_sum_to_one(self, tree):
        "exp(hier_log_softmax) over leaves must sum to 1."
        hls = hier.HierLogSoftmax(tree)
        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
        logp = np.asarray(hls(scores))
        probs = np.exp(logp)
        leaf_idx = [3, 5, 6]
        np.testing.assert_allclose(probs[:, leaf_idx].sum(1), 1.0, rtol=1e-5)
        # root likelihood is 1
        np.testing.assert_allclose(probs[:, 0], 1.0, rtol=1e-6)
        # child likelihood <= parent likelihood
        assert np.all(probs[:, 6] <= probs[:, 4] + 1e-6)

    def test_hier_softmax_ce_matches_manual(self, tree):
        "CE for a leaf label = -sum of conditional logp along its path."
        ce = hier.HierSoftmaxCrossEntropy(tree)
        hls = hier.HierLogSoftmax(tree)
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.standard_normal((1, 6)).astype(np.float32))
        onehot = jnp.zeros((1, 7)).at[0, 6].set(1.0)
        got = float(ce(scores, onehot))
        logp = np.asarray(hls(scores))
        np.testing.assert_allclose(got, -logp[0, 6], rtol=1e-5)

    def test_margin_loss_zero_margin_for_correct(self, tree):
        "With scores hugely favoring the label, soft margin loss -> ~0."
        loss = hier.MarginLoss(tree, tau=0.01)
        scores = jnp.asarray([[0.0, 0, 0, 0, 0, 100.0, 0]])
        onehot = jnp.zeros((1, 7)).at[0, 5].set(1.0)
        assert float(loss(scores, onehot)) < 0.01

    def test_sum_descendants(self, tree):
        sd = hier.SumDescendants(tree)
        values = jnp.asarray([[1.0, 1, 1, 1, 1, 1, 1]])
        out = np.asarray(sd(values))
        # descendants-incl-self counts: root 7, A 4, B 2, C 1, D 2, E 1, F 1
        np.testing.assert_allclose(out[0], [7, 4, 2, 1, 2, 1, 1])


class TestPickers:
    def test_argmax_with_confidence(self):
        spec = np.array([-3.0, -2, -1, -1])
        p = np.array([[0.9, 0.8, 0.4, 0.6]])
        # most specific with p > 0.5: node 3 (spec -1, p 0.6)
        got = hier.argmax_with_confidence(spec, p, 0.5, None)
        assert got[0] == 3

    def test_argmax_with_confidence_threshold(self):
        spec = np.array([-3.0, -2, -1])
        p = np.array([[0.9, 0.6, 0.2]])
        got = hier.argmax_with_confidence(spec, p, 0.5, None)
        assert got[0] == 1

    def test_pareto_optimal(self):
        info = np.array([0.0, 1, 2, 3])
        prob = np.array([1.0, 0.8, 0.5, 0.1])
        keep = hier.pareto_optimal_predictions(info, prob)
        np.testing.assert_array_equal(sorted(keep), [0, 1, 2, 3])
        # a dominated node (less info, less prob) is dropped
        info2 = np.array([0.0, 2, 1])
        prob2 = np.array([1.0, 0.8, 0.5])
        keep2 = hier.pareto_optimal_predictions(info2, prob2)
        assert 2 not in keep2


class TestTreeUtilities:
    def test_rooted_subtree(self, tree):
        sub = hier.rooted_subtree(tree, np.array([0, 1, 3, 4]))
        assert sub.num_nodes() == 4
        np.testing.assert_array_equal(sub.parents(), [-1, 0, 1, 1])

    def test_rooted_subtree_spanning(self, tree):
        sub, nodes = hier.rooted_subtree_spanning(tree, np.array([6]))
        np.testing.assert_array_equal(nodes, [0, 1, 4, 6])
        assert sub.num_nodes() == 4

    def test_uniform_cond(self, tree):
        p = hier.uniform_cond(tree)
        assert p[0] == 1.0
        # A and B are equally likely children of root
        np.testing.assert_allclose(p[1], 0.5)
        np.testing.assert_allclose(p[2], 0.5)
        # F = P(A) * P(D|A) * P(F|D) = 0.5 * 0.5 * 1
        np.testing.assert_allclose(p[6], 0.25)

    def test_truncate_at_lca(self, tree):
        # prediction deeper than gt on same path -> truncated to gt
        out = hier.truncate_at_lca(tree, np.array([4]), np.array([6]))
        assert out[0] == 4
        # different branch -> prediction kept
        out = hier.truncate_at_lca(tree, np.array([5]), np.array([6]))
        assert out[0] == 6

    def test_level_nodes(self, tree):
        levels = hier.level_nodes(tree)
        np.testing.assert_array_equal(levels[0], [1, 2])
        np.testing.assert_array_equal(levels[1], [3, 4, 5])
        np.testing.assert_array_equal(levels[2], [6])
        extended = hier.level_nodes(tree, extend=True)
        assert 3 in extended[2] and 5 in extended[2]

    def test_siblings(self, tree):
        sibs = hier.siblings(tree)
        np.testing.assert_array_equal(sibs[1], [2])
        np.testing.assert_array_equal(sibs[3], [4])
        assert len(sibs[0]) == 0
        assert len(sibs[5]) == 0  # only child

    def test_format_tree(self, tree):
        text = hier.format_tree(tree, ["root", "A", "B", "C", "D", "E", "F"])
        assert text.splitlines()[0] == "root"
        assert "└── F" in text

    def test_most_confident_leaf(self, tree):
        p = np.zeros((1, 7))
        p[0, [3, 5, 6]] = [0.2, 0.5, 0.3]
        assert hier.most_confident_leaf(tree, p)[0] == 5

    def test_max_info_majority_subtree(self, tree):
        p = np.array([[1.0, 0.9, 0.1, 0.3, 0.6, 0.1, 0.6]])
        # most specific non-trivial node with p > 0.5: node 4 is trivial
        # (one child), node 6 has p 0.6 and 1 leaf descendant
        assert hier.max_info_majority_subtree(tree, p)[0] == 6

    def test_plurality_threshold(self, tree):
        p = np.array([[1.0, 0.7, 0.3, 0.4, 0.3, 0.3, 0.3]])
        # non-trivial families: root{A,B} 2nd best 0.3; A{C,D} 2nd best 0.3
        np.testing.assert_allclose(hier.plurality_threshold(tree, p), [0.3])

    def test_lca_metric(self, tree):
        depth = tree.depths()
        m = hier.LCAMetric(tree, depth)
        gt, pr = np.array([6]), np.array([3])  # lca = 1 (depth 1)
        assert m.value_at_lca(gt, pr)[0] == 1
        assert m.deficient(gt, pr)[0] == 2  # gt depth 3 - lca 1
        assert m.excess(gt, pr)[0] == 1  # pr depth 2 - lca 1
        assert m.dist(gt, pr)[0] == 3
        np.testing.assert_allclose(m.recall(gt, pr), [1 / 3])
        np.testing.assert_allclose(m.precision(gt, pr), [1 / 2])
        np.testing.assert_allclose(m.f1(gt, pr), [0.4])


class TestTreeConstructionIO:
    def test_make_hierarchy_from_edges(self):
        from vamb_tpu.models.hier import make_hierarchy_from_edges

        tree, names = make_hierarchy_from_edges(
            [("root", "a"), ("root", "b"), ("a", "c"), ("a", "d")]
        )
        assert names == ["root", "a", "b", "c", "d"]
        assert tree.parents().tolist() == [-1, 0, 0, 1, 1]

    def test_multiple_parents_rejected(self):
        from vamb_tpu.models.hier import make_hierarchy_from_edges

        with pytest.raises(ValueError, match="multiple parents"):
            make_hierarchy_from_edges([("root", "a"), ("root", "b"), ("b", "a")])

    def test_load_edges(self):
        import io as _io

        from vamb_tpu.models.hier import load_edges, make_hierarchy_from_edges

        pairs = load_edges(_io.StringIO("root,a\na,b\n\nroot,c\n"))
        assert pairs == [("root", "a"), ("a", "b"), ("root", "c")]
        tree, names = make_hierarchy_from_edges(pairs)
        assert names == ["root", "a", "b", "c"]
        assert tree.parents().tolist() == [-1, 0, 1, 0]
        with pytest.raises(ValueError, match="2 columns"):
            load_edges(_io.StringIO("a,b,c\n"))


class TestLcaUtilities:
    def tree(self):
        # root(0) -> a(1), b(2); a -> c(3), d(4); c -> e(5)
        return hier.Hierarchy(np.array([-1, 0, 0, 1, 1, 3]))

    def test_lca_depth(self):
        from vamb_tpu.models.hier import lca_depth

        t = self.tree()
        assert lca_depth(t, np.array([5]), np.array([4]))[0] == 1  # lca = a
        assert lca_depth(t, np.array([5]), np.array([2]))[0] == 0  # lca = root
        assert lca_depth(t, np.array([5]), np.array([5]))[0] == 3  # itself

    def test_truncate_given_lca(self):
        from vamb_tpu.models.hier import truncate_given_lca

        gt = np.array([3, 3])
        pr = np.array([5, 2])
        lca = np.array([3, 0])  # pred 5 descends from gt 3; pred 2 does not
        np.testing.assert_array_equal(
            truncate_given_lca(gt, pr, lca), np.array([3, 2])
        )

    def test_arglexmin(self):
        from vamb_tpu.models.hier import arglexmin, arglexmin_where

        primary = np.array([3, 1, 1, 2])
        tiebreak = np.array([0, 2, 1, 0])
        # lexsort: last key is primary
        assert int(arglexmin((tiebreak, primary))) == 2
        ok = np.array([True, True, False, True])
        assert int(arglexmin_where((tiebreak, primary), ok)) == 1


class TestMultilabelAndRandomCut:
    def test_multilabel_log_likelihood(self):
        from vamb_tpu.models.hier import multilabel_log_likelihood

        scores = jnp.asarray([[0.0, 2.0, -1.0]])
        out = np.asarray(multilabel_log_likelihood(scores))
        expect = np.log(1 / (1 + np.exp(-np.array([0.0, 2.0, -1.0]))))
        np.testing.assert_allclose(out[0], expect, rtol=1e-6)
        rooted = np.asarray(
            multilabel_log_likelihood(scores, insert_root=True)
        )
        assert rooted.shape == (1, 4) and rooted[0, 0] == 0.0
        replaced = np.asarray(
            multilabel_log_likelihood(scores, replace_root=True)
        )
        assert replaced.shape == (1, 3) and replaced[0, 0] == 0.0

    def tree(self):
        return hier.Hierarchy(np.array([-1, 0, 0, 1, 1]))  # leaves: 2(b), 3, 4

    def test_random_cut_prob_zero_keeps_leaves(self):
        from vamb_tpu.models.hier import RandomCut

        cut = RandomCut(self.tree(), cut_prob=0.0)
        mask = np.asarray(cut(jax.random.key(0), ()))
        np.testing.assert_array_equal(mask, self.tree().leaf_mask())

    def test_random_cut_prob_one_stops_below_root(self):
        from vamb_tpu.models.hier import RandomCut

        cut = RandomCut(self.tree(), cut_prob=1.0)
        mask = np.asarray(cut(jax.random.key(0), ()))
        # every non-root node severed -> the cut's leaves are root's children
        np.testing.assert_array_equal(mask, [False, True, True, False, False])

    def test_random_cut_loss_matches_leaf_ce_at_prob_zero(self):
        from vamb_tpu.models.hier import RandomCutLoss

        tree = self.tree()
        loss_fn = RandomCutLoss(tree, cut_prob=0.0)
        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
        labels_leaf = rng.integers(0, 3, 6)  # index into leaf order [2, 3, 4]
        onehot = jax.nn.one_hot(labels_leaf, 3)
        loss = float(loss_fn(scores, onehot, jax.random.key(1)))
        # with no cut, this is plain softmax CE over the leaf columns
        leaf_cols = np.asarray(tree.leaf_subset())
        leaf_scores = np.asarray(scores)[:, leaf_cols]
        lse = np.log(np.exp(leaf_scores).sum(axis=1))
        expect = float(np.mean(lse - leaf_scores[np.arange(6), labels_leaf]))
        assert abs(loss - expect) < 1e-5


def test_make_graph_rejects_rank_named_root():
    """A rank literally named "root" would make the virtual root its own
    child and hang the BFS forever (caught live: the bench's taxonomy
    builder did exactly this); it must raise instead."""
    import pytest

    from vamb_tpu.models.hier import make_graph
    from vamb_tpu.taxonomy import ContigTaxonomy

    with pytest.raises(ValueError, match="root"):
        make_graph([ContigTaxonomy(["root", "Bacteria"])])

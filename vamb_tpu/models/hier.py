"""Taxonomy-tree algebra + hierarchical classification losses (JAX).

Behavioral parity: reference vamb/hloss_misc.py (itself adapted from
jvlmdr/hiercls) and `make_graph` of vamb/taxvamb_encode.py:29-61. The tree
side is host numpy; every loss is a precomputed mask/matmul + logsumexp —
ideal XLA shapes (SURVEY §7.1.7):

* `Hierarchy` — nodes 0..n-1, topologically sorted parent array.
* `make_graph` — taxonomy lineages -> BFS-ordered node list + parent table.
* `flat_softmax_nll` — cross-entropy over leaves supporting internal labels
  (logsumexp over the label's leaf descendants; hloss_misc.py:1102-1133).
* `hier_softmax_cross_entropy` — YOLO-style conditional softmax CE
  (hloss_misc.py:667-757): scores are per-child logits padded into
  (internal, max_children) blocks, log_softmax per block, summed over the
  label's ancestors weighted by the target distribution.
* `margin_loss` — soft margin with "incorrect" margin and tau
  (hloss_misc.py:1026-1099).
* prediction helpers: `sum_descendants`, `hier_log_softmax`,
  `argmax_with_confidence`, `pareto_optimal_predictions` (host-side pickers).
"""

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..taxonomy import ContigTaxonomy


class Hierarchy:
    """Rooted tree over nodes 0..n-1, defined by a parent array.

    Node 0 is the root (parent -1) and every parent index is smaller than
    its child's, so iterating nodes in index order visits parents before
    children and in reverse order children before parents — the two
    traversals every method here is built from. Construction precomputes
    the root-to-node path of every node (its ancestor chain), which makes
    the mask/paths/accumulation queries simple lookups over chains rather
    than edge-relaxation loops.
    """

    def __init__(self, parents: np.ndarray):
        parents = np.asarray(parents, dtype=int)
        n = len(parents)
        if n > 0 and parents[0] != -1:
            raise ValueError("node 0 must be the root (parent -1)")
        if not np.all(parents[1:] < np.arange(1, n)):
            raise ValueError("parents must be topologically sorted (parent < child)")
        self._parents = parents
        # root-to-node chains, built parents-first: chain(j) = chain(p) + [j]
        chains: list[list[int]] = [[0]] if n else []
        for j in range(1, n):
            chains.append(chains[parents[j]] + [j])
        self._chains = chains
        counts = np.zeros(n, dtype=int)
        for j in range(1, n):
            counts[parents[j]] += 1
        self._n_children = counts

    # -- basic shape -------------------------------------------------------

    def num_nodes(self) -> int:
        return len(self._parents)

    def parents(self, root_loop: bool = False) -> np.ndarray:
        "Parent array; with `root_loop` the root points at itself."
        if root_loop:
            out = self._parents.copy()
            out[out < 0] = np.flatnonzero(self._parents < 0)
            return out
        return self._parents.copy()

    def edges(self) -> list[tuple[int, int]]:
        "(parent, child) pairs in child order."
        return [(int(p), j) for j, p in enumerate(self._parents) if p >= 0]

    def children(self) -> dict[int, np.ndarray]:
        "Child index arrays keyed by internal node."
        groups: dict[int, list[int]] = {}
        for p, j in self.edges():
            groups.setdefault(p, []).append(j)
        return {p: np.array(js, dtype=int) for p, js in groups.items()}

    def num_children(self) -> np.ndarray:
        return self._n_children.copy()

    # -- leaves / depths ---------------------------------------------------

    def leaf_mask(self) -> np.ndarray:
        return self._n_children == 0

    def leaf_subset(self) -> np.ndarray:
        return np.flatnonzero(self.leaf_mask())

    def internal_subset(self) -> np.ndarray:
        return np.flatnonzero(self._n_children > 0)

    def num_leaf_nodes(self) -> int:
        return int(np.sum(self.leaf_mask()))

    def num_internal_nodes(self) -> int:
        return int(np.sum(self._n_children > 0))

    def depths(self) -> np.ndarray:
        "Edge count from the root (root depth 0)."
        return np.array([len(c) - 1 for c in self._chains], dtype=int)

    def num_leaf_descendants(self) -> np.ndarray:
        return self.accumulate_descendants(np.add, self.leaf_mask().astype(int))

    # -- traversing accumulations -----------------------------------------

    def accumulate_ancestors(self, func: Callable, values) -> np.ndarray:
        "Fold `func` down every root-to-leaf path (parents before children)."
        out = np.array(values)
        for j, p in enumerate(self._parents):
            if p >= 0:
                out[j] = func(out[p], out[j])
        return out

    def accumulate_descendants(self, func: Callable, values) -> np.ndarray:
        "Fold `func` up from the leaves (children before parents)."
        out = np.array(values)
        for j in range(len(self._parents) - 1, 0, -1):
            out[self._parents[j]] = func(out[self._parents[j]], out[j])
        return out

    # -- ancestor structure ------------------------------------------------

    def ancestor_mask(self, strict: bool = False) -> np.ndarray:
        "Boolean [i, j]: i lies on the root-to-j path (j itself unless strict)."
        n = self.num_nodes()
        out = np.zeros((n, n), dtype=bool)
        for j, chain in enumerate(self._chains):
            out[chain, j] = True
            if strict:
                out[j, j] = False
        return out

    def paths_padded(
        self, pad_value: int = -1, exclude_root: bool = False
    ) -> np.ndarray:
        "Root-to-node chains as one (n, max_depth) pad-filled index matrix."
        chains = (
            [c[1:] for c in self._chains] if exclude_root else self._chains
        )
        width = max((len(c) for c in chains), default=0)
        out = np.full((self.num_nodes(), width), pad_value, dtype=int)
        for j, chain in enumerate(chains):
            out[j, : len(chain)] = chain
        return out


def make_graph(
    taxes: Sequence[Optional[ContigTaxonomy]],
) -> tuple[list[str], dict[str, int], list[int]]:
    """Build the taxonomy DAG and BFS-order it into (nodes, index, parents).

    Matches reference taxvamb_encode.py:29-61: a virtual "root" node is node
    0; nodes are BFS-ordered with children in first-seen order, so the
    parent table is topologically sorted by construction.
    """
    children: dict[str, list[str]] = {"root": []}
    parent_of: dict[str, str] = {}
    for tax in taxes:
        if tax is None or len(tax.ranks) == 0:
            continue
        if "root" in tax.ranks:
            # the virtual root would become its own child and the BFS
            # below would never terminate
            raise ValueError(
                'Taxonomy rank named "root" collides with the virtual root '
                "node; rename the rank"
            )
        lineage = ["root"] + list(tax.ranks)
        for parent, child in zip(lineage, lineage[1:]):
            if child not in parent_of:
                parent_of[child] = parent
                children.setdefault(parent, []).append(child)
                children.setdefault(child, [])
            elif parent_of[child] != parent:
                raise ValueError(
                    f'Taxonomy is ambiguous: "{child}" has multiple parents'
                )
    # BFS from root, children in insertion order
    nodes: list[str] = ["root"]
    queue = ["root"]
    while queue:
        u = queue.pop(0)
        for v in children.get(u, ()):
            nodes.append(v)
            queue.append(v)
    ind_nodes = {v: i for i, v in enumerate(nodes)}
    table_parent = [
        -1 if n == "root" else ind_nodes[parent_of[n]] for n in nodes
    ]
    return nodes, ind_nodes, table_parent


def find_subset_index(base: list, subset: list) -> np.ndarray:
    "Index of subset elements in base list (injective map)."
    name_to_index = {x: i for i, x in enumerate(base)}
    return np.asarray([name_to_index[x] for x in subset], dtype=int)


class FindLCA:
    def __init__(self, tree: Hierarchy):
        self.paths = tree.paths_padded(-1, exclude_root=False)

    def __call__(self, inds_a: np.ndarray, inds_b: np.ndarray) -> np.ndarray:
        paths_a = self.paths[inds_a]
        paths_b = self.paths[inds_b]
        num_common = np.count_nonzero(
            (paths_a == paths_b) & (paths_a >= 0) & (paths_b >= 0), axis=-1
        )
        return self.paths[inds_a, num_common - 1]


def find_projection(tree: Hierarchy, node_subset: np.ndarray) -> np.ndarray:
    "Project each node to its nearest ancestor within `node_subset`."
    assert np.all(node_subset >= 0)
    paths = tree.paths_padded(-1)
    reindex = np.full(tree.num_nodes(), -1)
    reindex[node_subset] = np.arange(len(node_subset))
    subset_paths = np.where(paths >= 0, reindex[paths], -1)
    valid = subset_paths >= 0
    assert np.all(np.any(valid, axis=1))
    deepest = valid.shape[1] - 1 - np.argmax(valid[:, ::-1], axis=1)
    return subset_paths[np.arange(tree.num_nodes()), deepest]


# ----------------------------------------------------------------- losses


def uniform_leaf(tree: Hierarchy) -> np.ndarray:
    "Uniform distribution over leaves, accumulated up the tree."
    is_ancestor = tree.ancestor_mask(strict=False)
    is_leaf = tree.leaf_mask()
    return is_ancestor[:, is_leaf].sum(axis=1) / is_leaf.sum()


class SumDescendants:
    """values @ descendant-mask: out[..., i] = sum of values over descendants
    of i restricted to `subset` columns (hloss_misc.py:628-664)."""

    def __init__(
        self, tree: Hierarchy, subset: Optional[np.ndarray] = None, strict: bool = False
    ):
        matrix = tree.ancestor_mask(strict=strict)
        if subset is not None:
            matrix = matrix[:, subset]
        self.matrix = jnp.asarray(matrix.T.astype(np.float32))

    def __call__(self, values: jax.Array) -> jax.Array:
        return jnp.dot(values, self.matrix, preferred_element_type=jnp.float32)


class SumAncestors:
    def __init__(self, tree: Hierarchy, exclude_root: bool = False):
        matrix = tree.ancestor_mask(strict=False)
        if exclude_root:
            matrix = matrix[1:, :]
        self.matrix = jnp.asarray(matrix.astype(np.float32))

    def __call__(self, values: jax.Array) -> jax.Array:
        return jnp.dot(values, self.matrix, preferred_element_type=jnp.float32)


def SumLeafDescendants(tree: Hierarchy, strict: bool = False) -> SumDescendants:
    return SumDescendants(tree, subset=np.flatnonzero(tree.leaf_mask()), strict=strict)


class HierCondLogSoftmax:
    """Per-node log-likelihood given its parent, from flat child scores.

    `scores` has one logit per non-root node, ordered by node index; they are
    scattered into (internal, max_children) blocks, log_softmaxed per block,
    and scattered back (hloss_misc.py:722-821).
    """

    def __init__(self, tree: Hierarchy):
        node_to_children = tree.children()
        cond_children = [node_to_children[x] for x in tree.internal_subset()]
        cond_num = list(map(len, cond_children))
        self.num_internal = len(cond_children)
        self.max_children = max(cond_num)
        self.num_nodes = tree.num_nodes()
        row = np.concatenate([np.full(n, i) for i, n in enumerate(cond_num)])
        col = np.concatenate([np.arange(n) for n in cond_num])
        self.flat_index = jnp.asarray(row * self.max_children + col)
        self.child_index = jnp.asarray(np.concatenate(cond_children))

    def __call__(self, scores: jax.Array) -> jax.Array:
        prefix = scores.shape[:-1]
        flat_len = self.num_internal * self.max_children
        flat = jnp.full((*prefix, flat_len), -jnp.inf, scores.dtype)
        flat = flat.at[..., self.flat_index].set(scores)
        blocks = flat.reshape(*prefix, self.num_internal, self.max_children)
        logp = jax.nn.log_softmax(blocks, axis=-1).reshape(*prefix, flat_len)
        out = jnp.zeros((*prefix, self.num_nodes), scores.dtype)
        return out.at[..., self.child_index].set(logp[..., self.flat_index])


class HierLogSoftmax:
    "Node log-likelihood: conditional log-softmax summed over ancestors."

    def __init__(self, tree: Hierarchy):
        self.cond = HierCondLogSoftmax(tree)
        self.sum_ancestors = SumAncestors(tree, exclude_root=False)

    def __call__(self, scores: jax.Array) -> jax.Array:
        return self.sum_ancestors(self.cond(scores))


class HierSoftmaxCrossEntropy:
    """Cross-entropy for the conditional softmax (hloss_misc.py:667-719).

    `labels` is a (B, num_nodes) one-hot (or distribution) over nodes.
    """

    def __init__(self, tree: Hierarchy):
        self.cond = HierCondLogSoftmax(tree)
        self.sum_label_descendants = SumDescendants(tree)

    def __call__(self, scores: jax.Array, labels: jax.Array) -> jax.Array:
        q = self.sum_label_descendants(labels.astype(jnp.float32))
        log_cond_p = self.cond(scores)
        return jnp.mean(jnp.sum(q * -log_cond_p, axis=-1))


class FlatSoftmaxNLL:
    """Leaf cross-entropy supporting internal labels: NLL of the summed
    probability over the label's leaf descendants (hloss_misc.py:1102-1133)."""

    def __init__(self, tree: Hierarchy):
        is_ancestor = tree.ancestor_mask(strict=False)
        self.leaf_masks = jnp.asarray(is_ancestor[:, tree.leaf_mask()])

    def __call__(self, scores: jax.Array, labels: jax.Array) -> jax.Array:
        label_idx = jnp.argmax(labels, axis=1)
        logp_leaf = jax.nn.log_softmax(scores, axis=-1)
        mask = self.leaf_masks[label_idx]
        logp_label = jax.nn.logsumexp(
            jnp.where(mask, logp_leaf, -jnp.inf), axis=-1
        )
        return jnp.mean(-logp_label)


class MarginLoss:
    """Soft margin loss over all nodes (hloss_misc.py:1026-1099).

    TaxVamb uses margin="incorrect" (margin 1 unless the predicted node is an
    ancestor-or-self of the label) with tau=0.01 and soft hardness.
    """

    def __init__(
        self,
        tree: Hierarchy,
        hardness: str = "soft",
        margin: str = "incorrect",
        tau: float = 1.0,
    ):
        if hardness not in ("soft", "hard"):
            raise ValueError(f"unknown hardness {hardness!r}")
        n = tree.num_nodes()
        if margin == "incorrect":
            is_correct = tree.ancestor_mask(strict=False).T
            margin_arr = 1.0 - is_correct
        elif margin in ("edge_dist", "depth_dist"):
            depth = tree.depths()
            lca = FindLCA(tree)
            gt = np.arange(n)[:, None]
            pr = np.arange(n)[None, :]
            lca_idx = lca(np.broadcast_to(gt, (n, n)), np.broadcast_to(pr, (n, n)))
            margin_arr = (depth[gt] - depth[lca_idx]) + (depth[pr] - depth[lca_idx])
        else:
            raise ValueError(f"unknown margin {margin!r}")
        self.hardness = hardness
        self.tau = tau
        self.margin = jnp.asarray(margin_arr.astype(np.float32))

    def __call__(self, scores: jax.Array, labels: jax.Array) -> jax.Array:
        label_idx = jnp.argmax(labels, axis=1)
        label_score = jnp.take_along_axis(
            scores, label_idx[:, None], axis=-1
        )[:, 0]
        label_margin = self.margin[label_idx]
        if self.hardness == "soft":
            loss = -label_score + jax.nn.logsumexp(
                scores + self.tau * label_margin, axis=-1
            )
        else:
            loss = jax.nn.relu(
                jnp.max(scores - label_score[:, None] + self.tau * label_margin, axis=-1)
            )
        return jnp.mean(loss)


# --------------------------------------------------------- prediction pickers


def argmax_with_confidence(
    value: np.ndarray,
    p: np.ndarray,
    threshold: float,
    condition: Optional[np.ndarray] = None,
) -> np.ndarray:
    "Element maximizing (p, value) lexicographically subject to p > threshold."
    mask = p > threshold
    if condition is not None:
        mask = mask & condition
    assert np.all(np.any(mask, axis=-1)), "require at least one valid element"
    keys = np.broadcast_arrays(-p, -value)
    order = np.lexsort(keys, axis=-1)
    first_valid = np.expand_dims(
        np.argmax(np.take_along_axis(mask, order, axis=-1), axis=-1), -1
    )
    return np.take_along_axis(order, first_valid, axis=-1).squeeze(-1)


def pareto_optimal_predictions(
    info: np.ndarray,
    prob: np.ndarray,
    min_threshold: Optional[float] = None,
    condition: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Nodes more specific than every more-confident node, ordered by
    descending prob (hloss_misc.py:495-541)."""
    assert prob.ndim == 1 and info.ndim == 1
    is_valid = np.ones(prob.shape, dtype=bool)
    if min_threshold is not None:
        is_valid &= prob > min_threshold
    if condition is not None:
        is_valid &= condition
    assert np.any(is_valid), "require at least one valid element"
    prob_v = prob[is_valid]
    info_v = info[is_valid]
    valid_inds = np.flatnonzero(is_valid)
    order = np.lexsort((-info_v, -prob_v))
    prob_v = prob_v[order]
    info_v = info_v[order]
    max_info = np.maximum.accumulate(info_v)
    keep = np.concatenate(
        ([True], (prob_v[1:] > prob_v[:-1]) | (info_v[1:] > max_info[:-1]))
    )
    return valid_inds[order[keep]]


# -------------------------------------------------- additional tree algebra


def rooted_subtree(tree: Hierarchy, nodes: np.ndarray) -> Hierarchy:
    "Subtree over `nodes` (must include root 0 and all needed parents)."
    assert nodes[0] == 0
    reindex = np.full(tree.num_nodes(), -1)
    reindex[nodes] = np.arange(len(nodes))
    parents = tree.parents()
    subtree_parents = np.where(parents[nodes] >= 0, reindex[parents[nodes]], -1)
    assert np.all(subtree_parents[1:] >= 0), "parent not in subset"
    assert np.all(subtree_parents < np.arange(len(nodes)))
    return Hierarchy(subtree_parents)


def ancestors_union(tree: Hierarchy, node_subset: np.ndarray) -> np.ndarray:
    "Union of ancestors (incl. selves) of the given nodes."
    paths = tree.paths_padded(-1)[node_subset]
    return np.unique(paths[paths >= 0])


def rooted_subtree_spanning(
    tree: Hierarchy, nodes: np.ndarray
) -> tuple[Hierarchy, np.ndarray]:
    nodes = ancestors_union(tree, nodes)
    return rooted_subtree(tree, nodes), nodes


def uniform_cond(tree: Hierarchy) -> np.ndarray:
    "Node likelihoods under uniform child choice at every conditional."
    node_to_num_children = {k: len(v) for k, v in tree.children().items()}
    num_children = np.asarray(
        [node_to_num_children.get(x, 0) for x in range(tree.num_nodes())]
    )
    parent_index = tree.parents()
    log_cond_p = np.concatenate([[0.0], -np.log(num_children[parent_index[1:]])])
    is_ancestor = tree.ancestor_mask(strict=False)
    return np.exp(np.dot(is_ancestor.T, log_cond_p))


def truncate_at_lca(tree: Hierarchy, gt: np.ndarray, pr: np.ndarray) -> np.ndarray:
    "Truncate predictions that overshoot below the ground truth."
    lca = FindLCA(tree)(gt, pr)
    return np.where(gt == lca, gt, pr)


def level_nodes(tree: Hierarchy, extend: bool = False) -> list[np.ndarray]:
    "Nodes at each depth (leaves optionally extended to deeper levels)."
    node_depth = tree.depths()
    is_leaf = tree.leaf_mask()
    max_depth = int(np.max(node_depth))
    level_depth = np.arange(1, max_depth + 1)
    if not extend:
        level_masks = level_depth[:, None] == node_depth
    else:
        level_masks = (level_depth[:, None] == node_depth) | (
            (level_depth[:, None] > node_depth) & is_leaf
        )
    return [np.flatnonzero(mask) for mask in level_masks]


def siblings(tree: Hierarchy) -> list[np.ndarray]:
    "For each node, the other children of its parent (root: empty)."
    node_parent = tree.parents()
    node_children = tree.children()
    out = []
    for u in range(tree.num_nodes()):
        p = node_parent[u]
        if p < 0:
            out.append(np.empty(0, dtype=int))
        else:
            sibs = node_children[p]
            out.append(sibs[sibs != u])
    return out


def format_tree(
    tree: Hierarchy, node_names: Optional[list[str]] = None, include_size: bool = False
) -> str:
    "ASCII rendering of the tree for logs/debugging."
    if node_names is None:
        node_names = [str(i) for i in range(tree.num_nodes())]
    node_to_children = tree.children()
    node_sizes = tree.num_leaf_descendants()

    def subtree(node, node_prefix, desc_prefix):
        name = node_names[node]
        size = node_sizes[node]
        text = f"{name} ({size})" if include_size and size > 1 else name
        yield node_prefix + text + "\n"
        children = node_to_children.get(node, ())
        for i, child in enumerate(children):
            is_last = i == len(children) - 1
            yield from subtree(
                child,
                node_prefix=desc_prefix + ("└── " if is_last else "├── "),
                desc_prefix=desc_prefix + ("    " if is_last else "│   "),
            )

    return "".join(subtree(0, "", ""))


def most_confident_leaf(tree: Hierarchy, p: np.ndarray) -> np.ndarray:
    "Leaf with highest probability per row."
    assert p.shape[-1] == tree.num_nodes()
    is_leaf = tree.leaf_mask()
    masked = np.where(is_leaf, p, -np.inf)
    return np.argmax(masked, axis=-1)


def max_info_majority_subtree(tree: Hierarchy, p: np.ndarray) -> np.ndarray:
    "Most specific non-trivial node with probability > 0.5."
    assert p.shape[-1] == tree.num_nodes()
    specificity = -tree.num_leaf_descendants()
    not_trivial = tree.num_children() != 1
    return argmax_with_confidence(specificity, p, 0.5, not_trivial)


def plurality_threshold(
    tree: Hierarchy, p: np.ndarray, keepdims: bool = False
) -> np.ndarray:
    "Largest second-best child probability over all non-trivial families."
    children = tree.children()
    top2 = []
    for _u, inds in children.items():
        if len(inds) > 1:
            vals = np.sort(p[..., inds], axis=-1)[..., -2]
            top2.append(vals)
    threshold = np.max(np.stack(top2, axis=-1), axis=-1)
    if keepdims:
        threshold = np.expand_dims(threshold, -1)
    return threshold


class LCAMetric:
    "Value-at-LCA metrics (depth/info recall, precision, f1, distances)."

    def __init__(self, tree: Hierarchy, value: np.ndarray):
        self.value = value
        self.find_lca = FindLCA(tree)

    def value_at_lca(self, gt, pr):
        return self.value[self.find_lca(gt, pr)]

    def deficient(self, gt, pr):
        return self.value[gt] - self.value[self.find_lca(gt, pr)]

    def excess(self, gt, pr):
        return self.value[pr] - self.value[self.find_lca(gt, pr)]

    def dist(self, gt, pr):
        lca = self.find_lca(gt, pr)
        return (self.value[pr] - self.value[lca]) + (self.value[gt] - self.value[lca])

    def recall(self, gt, pr):
        lca_value = self.value[self.find_lca(gt, pr)]
        gt_value = self.value[gt]
        with np.errstate(invalid="ignore"):
            return np.where(
                (lca_value == 0) & (gt_value == 0), 1.0, lca_value / gt_value
            )

    def precision(self, gt, pr):
        lca_value = self.value[self.find_lca(gt, pr)]
        pr_value = self.value[pr]
        with np.errstate(invalid="ignore"):
            return np.where(
                (lca_value == 0) & (pr_value == 0), 1.0, lca_value / pr_value
            )

    def f1(self, gt, pr):
        r = self.recall(gt, pr)
        p = self.precision(gt, pr)
        with np.errstate(divide="ignore"):
            return 2 / (1 / r + 1 / p)


# ----------------------------------------------------- tree construction IO


def make_hierarchy_from_edges(
    pairs: Sequence[tuple[str, str]],
) -> tuple[Hierarchy, list[str]]:
    """Build a Hierarchy from (parent, child) name pairs.

    The root is the first pair's parent; every other node must appear
    exactly once as a child, and edges must come parent-first so the node
    numbering (edge order + 1) is topologically sorted
    (hloss_misc.py:167-195 contract).
    """
    if not pairs:
        raise ValueError("need at least one edge")
    root = pairs[0][0]
    index_of = {root: 0}
    names = [root]
    parents = [-1]
    for parent, child in pairs:
        if child in index_of:
            raise ValueError(f'node "{child}" has multiple parents')
        if parent not in index_of:
            raise ValueError(f'parent "{parent}" seen before being defined')
        index_of[child] = len(names)
        parents.append(index_of[parent])
        names.append(child)
    return Hierarchy(np.asarray(parents)), names


def load_edges(f, delimiter: str = ",") -> list[tuple[str, str]]:
    "Read (parent, child) rows from a delimited text stream."
    import csv

    pairs: list[tuple[str, str]] = []
    for row in csv.reader(f, delimiter=delimiter):
        if not row:
            continue
        if len(row) != 2:
            raise ValueError(f"expected 2 columns, got {row}")
        pairs.append((row[0], row[1]))
    return pairs


# ---------------------------------------------------------- LCA utilities


def lca_depth(tree: Hierarchy, inds_a: np.ndarray, inds_b: np.ndarray) -> np.ndarray:
    "Depth of the lowest common ancestor (root = depth 0); broadcasts."
    paths = tree.paths_padded(exclude_root=True)
    shared = (
        (paths[inds_a] == paths[inds_b]) & (paths[inds_a] >= 0) & (paths[inds_b] >= 0)
    )
    return np.count_nonzero(shared, axis=-1)


def truncate_given_lca(gt: np.ndarray, pr: np.ndarray, lca: np.ndarray) -> np.ndarray:
    "Replace predictions that descend from the ground truth by the truth itself."
    return np.where(gt == lca, gt, pr)


def arglexmin(keys: tuple, axis: int = -1) -> np.ndarray:
    "Index of the lexicographic minimum over `axis` (last key is primary)."
    return np.take(np.lexsort(keys, axis=axis), 0, axis=axis)


def arglexmin_where(
    keys: tuple, condition: np.ndarray, axis: int = -1, keepdims: bool = False
) -> np.ndarray:
    "Lexicographic argmin restricted to elements where `condition` holds."
    if not np.all(np.any(condition, axis=axis)):
        raise ValueError("need at least one valid element along the axis")
    order = np.lexsort(keys, axis=axis)
    ordered_ok = np.take_along_axis(condition, order, axis=axis)
    first = np.expand_dims(np.argmax(ordered_ok, axis=axis), axis)
    result = np.take_along_axis(order, first, axis=axis)
    return result if keepdims else np.squeeze(result, axis=axis)


# ------------------------------------------- multilabel / random-cut losses


def multilabel_log_likelihood(
    scores: jax.Array,
    insert_root: bool = False,
    replace_root: bool = False,
    temperature: Optional[float] = None,
) -> jax.Array:
    """Per-node independent log-likelihoods log sigmoid(score / T) over the
    last axis, with the root optionally prepended or pinned to logp = 0
    (hloss_misc.py:843-862)."""
    if insert_root and replace_root:
        raise ValueError("insert_root and replace_root are exclusive")
    if temperature:
        scores = scores / temperature
    logp = jax.nn.log_sigmoid(scores)
    zero = jnp.zeros((*logp.shape[:-1], 1), logp.dtype)
    if insert_root:
        return jnp.concatenate([zero, logp], axis=-1)
    if replace_root:
        return jnp.concatenate([zero, logp[..., 1:]], axis=-1)
    return logp


class RandomCut:
    """Sample random tree cuts: walking down from the root, each node is
    severed with probability `cut_prob`; the result is a boolean mask over
    nodes marking the leaf frontier of the surviving subtree
    (hloss_misc.py:865-909, "Deep RTC", Wu et al. 2020).
    """

    def __init__(self, tree: Hierarchy, cut_prob: float, permit_root_cut: bool = False):
        self.n = tree.num_nodes()
        self.cut_prob = cut_prob
        self.permit_root_cut = permit_root_cut
        self.sum_ancestors = SumAncestors(tree)  # includes the node itself
        self.parent_loop = jnp.asarray(tree.parents(root_loop=True))
        # child-count matrix: counts[..., p] = number of kept children of p
        counts = np.zeros((self.n - 1, self.n), np.float32)
        counts[np.arange(1, self.n) - 1, tree.parents()[1:]] = 1.0
        self._child_counts = jnp.asarray(counts)

    def __call__(self, key: jax.Array, batch_shape: tuple = ()) -> jax.Array:
        drop = jax.random.bernoulli(
            key, self.cut_prob, (*batch_shape, self.n)
        ).astype(jnp.float32)
        if not self.permit_root_cut:
            drop = drop.at[..., 0].set(0.0)
        # a node survives if no ancestor (nor itself) was severed
        alive = self.sum_ancestors(drop) == 0
        # the cut keeps every surviving node plus the direct children of
        # surviving nodes (the severed frontier)
        in_cut = alive[..., self.parent_loop].at[..., 0].set(True)
        kept_children = jnp.dot(
            in_cut[..., 1:].astype(jnp.float32), self._child_counts,
            preferred_element_type=jnp.float32,
        )
        return in_cut & (kept_children == 0)


class RandomCutLoss:
    """Cross-entropy over the leaves of a random cut (hloss_misc.py:912-962).

    `labels` are leaf one-hots; the target inside the cut is the unique cut
    node that is an ancestor-or-self of the labeled leaf.
    """

    def __init__(self, tree: Hierarchy, cut_prob: float, permit_root_cut: bool = False):
        self.random_cut = RandomCut(tree, cut_prob, permit_root_cut)
        targets = tree.ancestor_mask(strict=False).T[tree.leaf_subset()]
        self.label_to_targets = jnp.asarray(targets)

    def __call__(self, scores: jax.Array, labels: jax.Array, key: jax.Array) -> jax.Array:
        label_idx = jnp.argmax(labels, axis=-1)
        cut = self.random_cut(key, scores.shape[:-1])
        targets = self.label_to_targets[label_idx]
        cut, targets, scores = cut[..., 1:], targets[..., 1:], scores[..., 1:]
        on_target = cut & targets
        pos = jnp.sum(jnp.where(on_target, scores, 0.0), axis=-1)
        lse = jax.nn.logsumexp(jnp.where(cut, scores, -jnp.inf), axis=-1)
        return jnp.mean(lse - pos)

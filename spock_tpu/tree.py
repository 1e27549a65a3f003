"""Scenario-tree topology for uniform branching factor, in closed form.

TPU-first design note
---------------------
The reference (``/root/reference/src/scenario_tree.jl:25-109``) stores the tree
as dictionaries ``child_mapping``/``anc_mapping`` plus per-node index records.
On TPU we instead exploit the *algebraic* structure of a uniform-branching tree
laid out stage-major (root first, then stage 1, ...):

* node indices are 0-based; the root is node ``0``;
* stage ``t`` occupies the contiguous index range
  ``[stage_offset(t), stage_offset(t+1))`` with ``stage_offset(t) =
  (d**t - 1) // (d - 1)``;
* ``children(i) = d*i + 1, ..., d*i + d`` and ``parent(j) = (j - 1) // d``;
* the realization ("w") index of non-root node ``j`` is its sibling index
  ``(j - 1) % d`` (this reproduces the reference's ``w = (i % d) + 1`` rule at
  ``scenario_tree.jl:77`` shifted to 0-based indexing);
* consequently, for any per-node array ``a`` over nodes ``1..n-1``,
  ``a.reshape(n_nonleaf, d)`` groups the children of non-leaf node ``i`` in
  row ``i`` — *all* parent/child traffic becomes reshapes/broadcasts, never
  gather/scatter.  This is the property that lets every kernel in
  :mod:`spock_tpu.ops` run as dense batched tensor ops on the MXU/VPU.

All fields are plain Python ints so a :class:`UniformTree` can be used as a
static (hashable) argument of jitted functions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class UniformTree:
    """Topology of a scenario tree with uniform branching factor ``d``.

    Mirrors the capability of ``generate_scenario_tree_uniform_branching_factor_v2``
    (``/root/reference/src/scenario_tree.jl:61-109``) without materializing any
    index maps.

    Attributes:
      N: number of stages (the root is stage 0; leaves are stage ``N - 1``).
         Matches the reference's ``N``.
      d: branching factor (>= 2).
    """

    N: int
    d: int

    def __post_init__(self):
        if self.d <= 1:
            raise ValueError(f"Branching factor d must be > 1, got {self.d}.")
        if self.N <= 1:
            raise ValueError(f"Horizon N must be > 1, got {self.N}.")

    # ---- node counts (cf. scenario_tree.jl:67-71) ----
    @property
    def n(self) -> int:
        """Total number of nodes, (d^N - 1) / (d - 1)."""
        return (self.d**self.N - 1) // (self.d - 1)

    @property
    def n_leaf(self) -> int:
        """Number of leaf nodes, d^(N-1)."""
        return self.d ** (self.N - 1)

    @property
    def n_nonleaf(self) -> int:
        """Number of non-leaf nodes, (d^(N-1) - 1)/(d - 1)."""
        return (self.d ** (self.N - 1) - 1) // (self.d - 1)

    @property
    def leaf_start(self) -> int:
        """Index of the first leaf node (0-based)."""
        return self.n_nonleaf

    # ---- stage structure (cf. min_index_per_timestep, scenario_tree.jl:107) ----
    def stage_offset(self, t: int) -> int:
        """Index of the first node of stage ``t`` (0-based, t in [0, N])."""
        return (self.d**t - 1) // (self.d - 1)

    def stage_size(self, t: int) -> int:
        return self.d**t

    def stage_slice(self, t: int) -> slice:
        return slice(self.stage_offset(t), self.stage_offset(t + 1))

    # ---- closed-form maps ----
    def parent(self, j: int) -> int:
        if j <= 0:
            raise ValueError("The root has no parent.")
        return (j - 1) // self.d

    def children(self, i: int) -> range:
        if i >= self.n_nonleaf:
            raise ValueError(f"Node {i} is a leaf; it has no children.")
        return range(self.d * i + 1, self.d * i + self.d + 1)

    def w(self, j: int) -> int:
        """Realization index of non-root node ``j`` (which (A, B) pair was used
        on the edge parent(j) -> j). Equal to the sibling index ``(j-1) % d``."""
        if j <= 0:
            raise ValueError("The root has no realization index.")
        return (j - 1) % self.d

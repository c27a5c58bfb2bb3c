"""Driver-side planners: the two-level grid + sorted-cell-range partition map
(successor of the reference's GTree, GTree.java:164-202) and skew-handling
partitioning helpers (salting, range shuffles)."""

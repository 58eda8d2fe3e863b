"""Execution plans: the superstep driver loop with checkpoint/resume that
iterative kernels (PageRank, components, LPA) share."""

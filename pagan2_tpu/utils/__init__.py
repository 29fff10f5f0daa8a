from .log import (log_out, log_progress, finish_progress, set_noise,
                  get_noise)
from .fetch import fetch_np


def ensure_recursion_for_depth(depth: int, margin: int = 2000) -> None:
    """Raise CPython's recursion limit for deep trees: a pileup ladder
    grows one level per accepted read, and the tree walkers (column
    extraction, leaves()/nodes_postorder() generators, contig walks)
    recurse once per level — thousands of reads blow the default
    1000-frame limit. Python-level frames are heap-allocated in 3.12+,
    so raising the limit proportionally is safe."""
    import sys
    need = 3 * int(depth) + margin
    if sys.getrecursionlimit() < need:
        sys.setrecursionlimit(need)


def tree_depth(node) -> int:
    """Iterative tree depth (the recursive walkers need the limit
    raised BEFORE they run)."""
    d = 0
    stack = [(node, 1)]
    while stack:
        n, k = stack.pop()
        if k > d:
            d = k
        for c in getattr(n, "children", ()):
            stack.append((c, k + 1))
    return d

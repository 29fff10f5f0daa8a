from .sequence_graph import SequenceGraph
from .builders import build_leaf_graph, revcomp

from .newick import TreeNode, parse_newick, midpoint_root
